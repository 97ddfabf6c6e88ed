from jesse_spark.sources.fixtures import (
    clips_df,
    codecs_df,
    expected_violations,
    CLIPS_SCHEMA,
    CLIPS_CONSTRAINT_SCHEMA,
)

__all__ = [
    "clips_df",
    "codecs_df",
    "expected_violations",
    "CLIPS_SCHEMA",
    "CLIPS_CONSTRAINT_SCHEMA",
]
