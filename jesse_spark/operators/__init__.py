from jesse_spark.operators.stats import column_stats
from jesse_spark.operators.uniqueness import approx_unique_stats, find_duplicates, uniqueness_violations
from jesse_spark.operators.integrity import ri_violations, ri_valid, ri_violation_rows
from jesse_spark.operators.drift import numeric_drift, categorical_psi

__all__ = [
    "column_stats",
    "approx_unique_stats",
    "find_duplicates",
    "uniqueness_violations",
    "ri_violations",
    "ri_valid",
    "ri_violation_rows",
    "numeric_drift",
    "categorical_psi",
]
