"""Single-pass column statistics.

The table-level generalization of jesse's per-value min/max/length
keywords (SURVEY.md §2.5): ONE ``df.agg(...)`` computes count,
null-rate, min, max, mean, approx distinct (HLL++) and approx quantiles
(a true KLL sketch — Spark 4's built-in DataSketches
``kll_sketch_agg_double``; ``sketch="gk"`` falls back to
``percentile_approx``) for every requested column.  One scan, one
partial-aggregate shuffle of a single row — this is the plan shape
that survives 100 TB (never one job per column).

KLL sketches are MERGEABLE: :func:`quantile_sketches` returns the raw
sketch bytes per column, and :func:`merge_quantile_sketches` folds
sketches from independent shards/snapshots into one — the primitive a
resumable per-partition checkpoint run needs to report global
quantiles without a second full scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType)

DEFAULT_QUANTILES = (0.25, 0.5, 0.75, 0.95, 0.99)


def _quantile_agg(c: str, quantiles, accuracy: int, sketch: str):
    if sketch == "kll":
        # count guard: kll_sketch_agg_double yields a NULL sketch for an
        # empty/all-null column and get_quantile rejects it
        # (KLL_INVALID_INPUT_SKETCH_BUFFER); return null quantiles like
        # percentile_approx does
        return F.when(
            F.count(F.col(c)) > 0,
            F.kll_sketch_get_quantile_double(
                F.kll_sketch_agg_double(F.col(c).cast("double")),
                F.lit(list(quantiles))))
    if sketch != "gk":
        raise ValueError(f"unknown quantile sketch {sketch!r} "
                         "(expected 'kll' or 'gk')")
    return F.percentile_approx(F.col(c).cast("double"), list(quantiles),
                               accuracy)


ALL_METRICS = ("rows", "non_null", "null_rate", "approx_distinct",
               "min", "max", "mean", "quantiles")


def column_stats(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    quantiles: tuple[float, ...] = DEFAULT_QUANTILES,
    accuracy: int = 10000,
    sketch: str = "kll",
    metrics: tuple[str, ...] = ALL_METRICS,
) -> DataFrame:
    """Long-format stats: one output row per column, computed in a
    single aggregate pass (the stack() unpivot runs on the 1-row agg
    result, not on the data).  ``sketch`` picks the quantile engine:
    "kll" (DataSketches KLL, mergeable, the north-star algorithm) or
    "gk" (percentile_approx); ``accuracy`` applies to "gk" only — KLL
    precision is governed by the sketch's k (see
    :func:`quantile_sketches`).

    ``metrics`` selects which statistics to compute (and which columns
    the output carries, in ALL_METRICS order).  Catalyst cannot prune
    through the stack() unpivot, so a caller that only reads min/max/
    mean would otherwise still pay for the KLL sketch and HLL
    registers on every row — ~60% of this aggregation's per-row work
    (r6, guide §1.2: don't compute what you throw away)."""
    unknown = set(metrics) - set(ALL_METRICS)
    if unknown:
        raise ValueError(f"unknown metrics {sorted(unknown)}")
    metrics = tuple(m for m in ALL_METRICS if m in set(metrics))
    types = dict((f.name, f.dataType) for f in df.schema.fields)
    cols = cols or [c for c in df.columns]
    aggs = []
    for c in cols:
        is_num = isinstance(types[c], _NUMERIC)
        builders = {
            "rows": lambda c=c: F.count(F.lit(1)),
            "non_null": lambda c=c: F.count(F.col(c)),
            "null_rate": lambda c=c: F.avg(F.col(c).isNull().cast("double")),
            "approx_distinct": lambda c=c: F.approx_count_distinct(F.col(c)),
            "min": lambda c=c, n=is_num: (
                F.min(F.col(c).cast("double")) if n else F.lit(None).cast("double")),
            "max": lambda c=c, n=is_num: (
                F.max(F.col(c).cast("double")) if n else F.lit(None).cast("double")),
            "mean": lambda c=c, n=is_num: (
                F.avg(F.col(c).cast("double")) if n else F.lit(None).cast("double")),
            "quantiles": lambda c=c, n=is_num: (
                _quantile_agg(c, quantiles, accuracy, sketch)
                if n else F.lit(None).cast("array<double>")),
        }
        aggs += [builders[m]().alias(f"{c}__{m}") for m in metrics]
    one = df.agg(*aggs)
    stack_parts = [
        f"'{c}', " + ", ".join(f"`{c}__{m}`" for m in metrics)
        for c in cols
    ]
    expr = (
        f"stack({len(cols)}, " + ", ".join(stack_parts) +
        ") as (column, " + ", ".join(metrics) + ")"
    )
    return one.selectExpr(expr)


def quantile_sketches(df: DataFrame, cols: list[str],
                      k: int | None = None) -> DataFrame:
    """One row: the raw KLL sketch bytes per numeric column (k = sketch
    size parameter, default Spark's 200 ~ 1.7% rank error).  Bytes are
    mergeable across shards/snapshots — see
    :func:`merge_quantile_sketches`."""
    aggs = [
        (F.kll_sketch_agg_double(F.col(c).cast("double"), F.lit(k))
         if k is not None
         else F.kll_sketch_agg_double(F.col(c).cast("double"))).alias(c)
        for c in cols
    ]
    return df.agg(*aggs)


def merge_quantile_sketches(sketches: DataFrame, cols: list[str]) -> DataFrame:
    """Fold per-shard sketch rows (the output rows of
    :func:`quantile_sketches` unioned across shards) into one global
    sketch per column — the resumable-checkpoint merge path: each
    shard's stats job writes its sketch bytes to the manifest; the
    report step merges WITHOUT rescanning data."""
    return sketches.agg(*[F.kll_merge_agg_double(F.col(c)).alias(c)
                          for c in cols])


def sketch_quantiles(sketches: DataFrame, cols: list[str],
                     quantiles: tuple[float, ...] = DEFAULT_QUANTILES) -> DataFrame:
    """Evaluate quantiles from (merged) sketch bytes.  EAGER: the input
    is one row by contract (a global aggregate), so this collects it —
    which also sidesteps a Catalyst edge: over a provably-empty input,
    PropagateEmptyRelation turns the sketch into a literal null and
    ConstantFolding then evaluates kll_sketch_get_quantile_double
    bottom-up (throwing KLL_INVALID_INPUT_SKETCH_BUFFER) no matter how
    the call is null-guarded.  A null sketch (all shards empty) yields
    null quantiles, not an error."""
    spark = sketches.sparkSession
    [row] = sketches.collect()
    # ONE single-row job evaluates every live column's quantiles.  The
    # n>0 gate must be a Python branch on the collected row, not
    # F.when: an EMPTY sketch (kll_sketch_agg over zero non-null rows
    # returns a valid 8-byte preamble, NOT null) makes get_quantile
    # throw, and ConstantFolding evaluates the literal-input call
    # eagerly regardless of any enclosing CASE.  Emptiness is decided
    # from the serialized length — the DataSketches KLL compact format
    # is exactly 8 preamble bytes when and only when n == 0 (16 bytes
    # single-item, 20+ otherwise; pinned by test) — which saves the
    # kll_sketch_get_n_double probe job that r5 ran per call (guide
    # §1: this operator's wall was dominated by driver job count, not
    # compute).
    live = [c for c in cols if row[c] is not None and len(bytes(row[c])) > 8]
    q_by_col: dict[str, list] = {}
    if live:
        q_row = spark.range(1).select(*[
            F.kll_sketch_get_quantile_double(
                F.lit(bytes(row[c])), F.lit(list(quantiles))).alias(c)
            for c in live]).head()
        q_by_col = {c: q_row[c] for c in live}
    vals = [q_by_col.get(c) for c in cols]
    schema = T.StructType(
        [T.StructField(c, T.ArrayType(T.DoubleType())) for c in cols])
    return spark.createDataFrame([tuple(vals)], schema)
