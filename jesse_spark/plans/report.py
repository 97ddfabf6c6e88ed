"""Error-report sink — parity with jesse's CLI ``--json`` output.

jesse_cli emits ``{filename, result: ok|error, errors: [...]}`` per
instance (jesse_cli.erl:62-79) where each error carries
``{invalid, schema/constraint, error, data/observed, path}``
(jesse_error:to_json, jesse_error.erl:106-138).  The engine's analog is
one report row per clip: verdict + the violation structs, writable as
JSON lines or any DataFrame sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def per_row_reports(validated: DataFrame, key_col: str = "clip_id") -> DataFrame:
    """(key, result, errors) — jesse CLI report shape, one row per clip."""
    return validated.select(
        F.col(key_col),
        F.when(F.col("valid"), F.lit("ok")).otherwise(F.lit("error")).alias("result"),
        F.transform(
            F.col("violations"),
            lambda v: F.struct(
                v.getField("constraint").alias("error"),
                v.getField("path").alias("path"),
                v.getField("observed").alias("data"),
            ),
        ).alias("errors"),
    )


def write_json_reports(validated: DataFrame, path: str,
                       key_col: str = "clip_id", mode: str = "overwrite") -> None:
    """JSON-lines sink (the CLI's --json analog, distributed)."""
    per_row_reports(validated, key_col).write.mode(mode).json(path)


def write_violations(violations: DataFrame, path: str,
                     fmt: str = "parquet", mode: str = "overwrite") -> None:
    """Violation-rows sink (partitioned by constraint for cheap
    downstream filtering: partition pruning on the violation type)."""
    (violations.write.mode(mode).partitionBy("constraint").format(fmt).save(path))
