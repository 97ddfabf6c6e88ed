"""Structured-Streaming validation.

The reference has no streaming (its instance stream is a CLI file list,
jesse_cli.erl:36-97).  The engine applies the SAME compiled check plan
to a streaming DataFrame — compiled Column predicates are
source-agnostic, so `readStream → with_violations → writeStream` needs
no new operator code.  Windowed verdict aggregation uses event-time +
watermark so late clips still land in their window's verdict.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jesse_spark.compiler import compile_checks
from jesse_spark.plans.validate import with_violations


def validate_stream(stream_df: DataFrame, schema: Any) -> DataFrame:
    """Attach violations/valid to a streaming DataFrame (stateless —
    one projection, safe under any output mode)."""
    checks = compile_checks(schema, stream_df.schema, null_is_absent=True)
    return with_violations(stream_df, checks)


def streaming_verdicts(
    validated: DataFrame,
    *,
    ts_col: str = "ingest_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Per-event-time-window pass/fail counts with a watermark for late
    data — the streaming analog of partition_verdicts."""
    return (
        validated.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((~F.col("valid")).cast("long")).alias("invalid_rows"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "rows",
            "invalid_rows",
            (F.col("invalid_rows") == 0).alias("passed"),
        )
    )
