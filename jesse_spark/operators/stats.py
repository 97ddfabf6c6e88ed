"""Single-pass column statistics.

The table-level generalization of jesse's per-value min/max/length
keywords (SURVEY.md §2.5): ONE ``df.agg(...)`` computes count,
null-rate, min, max, mean, approx distinct (HLL++) and approx quantiles
(Spark's built-in KLL-style percentile_approx sketch) for every
requested column.  One scan, one partial-aggregate shuffle of a single
row — this is the plan shape that survives 100 TB (never one job per
column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)

DEFAULT_QUANTILES = (0.25, 0.5, 0.75, 0.95, 0.99)


def column_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    quantiles: tuple[float, ...] = DEFAULT_QUANTILES,
    accuracy: int = 10000,
) -> DataFrame:
    """Long-format stats: one output row per column, computed in a
    single aggregate pass (the stack() unpivot runs on the 1-row agg
    result, not on the data)."""
    types = dict((f.name, f.dataType) for f in df.schema.fields)
    cols = cols or [c for c in df.columns]
    aggs = []
    for c in cols:
        is_num = isinstance(types[c], _NUMERIC)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.count(F.col(c)).alias(f"{c}__non_null"),
            F.avg(F.col(c).isNull().cast("double")).alias(f"{c}__null_rate"),
            F.approx_count_distinct(F.col(c)).alias(f"{c}__approx_distinct"),
            (F.min(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"{c}__min"),
            (F.max(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"{c}__max"),
            (F.avg(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"{c}__mean"),
            (F.percentile_approx(F.col(c).cast("double"), list(quantiles), accuracy)
             if is_num else F.lit(None).cast("array<double>")).alias(f"{c}__quantiles"),
        ]
    one = df.agg(*aggs)
    stack_parts = []
    for c in cols:
        stack_parts.append(
            f"'{c}', `{c}__rows`, `{c}__non_null`, `{c}__null_rate`, "
            f"`{c}__approx_distinct`, `{c}__min`, `{c}__max`, `{c}__mean`, `{c}__quantiles`"
        )
    n = len(cols)
    expr = (
        f"stack({n}, " + ", ".join(stack_parts) +
        ") as (column, rows, non_null, null_rate, approx_distinct, "
        "min, max, mean, quantiles)"
    )
    return one.selectExpr(expr)
