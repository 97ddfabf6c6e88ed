"""jesse_spark — a PySpark-native schema + constraint validation engine.

Re-expresses the JSON-Schema draft-03/04/06 keyword semantics of the
reference validator (for-GET/jesse, an Erlang per-document recursive
validator) as compiled Catalyst ``Column`` predicates and table-level
checks (stats / uniqueness / referential integrity / drift), plus
vectorized Arrow pandas-UDF audio payload checks.

This is a from-scratch Spark-first design, not a port: schemas compile
once on the driver into a plan of boolean Column expressions; Spark
executes all row-level keywords in ONE whole-stage-codegen projection,
all column stats in ONE aggregate pass, and uniqueness / RI / drift as
shuffle- and broadcast-aware DataFrame plans.

Reference semantics citations throughout use file:line into
/root/reference (jesse @ 2025-10-17).
"""

from jesse_spark.errors import ErrorCodes
from jesse_spark.schema.parser import SchemaRegistry, normalize_schema
from jesse_spark.compiler import compile_checks, compile_pred, Check
from jesse_spark.plans.validate import (
    with_violations,
    violation_rows,
    partition_verdicts,
    validate,
)

__all__ = [
    "ErrorCodes",
    "SchemaRegistry",
    "normalize_schema",
    "compile_checks",
    "compile_pred",
    "Check",
    "with_violations",
    "violation_rows",
    "partition_verdicts",
    "validate",
]

__version__ = "0.1.0"
