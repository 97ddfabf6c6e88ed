from jesse_spark.plans.validate import (
    with_violations,
    violation_rows,
    partition_verdicts,
    validate,
    ValidationResult,
)
from jesse_spark.plans.checkpoint import CheckpointManager

__all__ = [
    "with_violations",
    "violation_rows",
    "partition_verdicts",
    "validate",
    "ValidationResult",
    "CheckpointManager",
]
