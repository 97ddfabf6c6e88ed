from jesse_spark.schema.parser import (
    SchemaRegistry,
    normalize_schema,
    detect_draft,
    DRAFT3,
    DRAFT4,
    DRAFT6,
)

__all__ = [
    "SchemaRegistry",
    "normalize_schema",
    "detect_draft",
    "DRAFT3",
    "DRAFT4",
    "DRAFT6",
]
