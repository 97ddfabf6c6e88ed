"""Explicit skew handling — salted repartitioning (north_rule).

The clips table is deliberately skewed (16 kHz sr and pcm_s16le codec
dominate — FIXTURES.md §1), so key-partitioned work on codec/sr_hz
lands most rows in a few reducers.  AQE's skew-join splitting covers
joins; for groupBy-style work the classic fix is a salt column:

- :func:`salted_repartition` spreads one logical key over
  ``salt_buckets`` physical partitions;
- :func:`salted_group_agg` runs the two-level aggregation
  (key, salt) → key, so the hot key's partial aggregates are computed
  by many tasks and only the tiny per-salt partials shuffle again.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(salt_buckets: int, seed_col: Column | None = None) -> Column:
    """Deterministic salt from a row-identity column when given (stable
    across retries — important for exactly-once sinks), else random."""
    if seed_col is not None:
        return F.pmod(F.xxhash64(seed_col), F.lit(salt_buckets)).cast("int")
    return (F.rand() * salt_buckets).cast("int")


def salted_repartition(df: DataFrame, key: str, *, salt_buckets: int = 32,
                       id_col: str | None = None,
                       num_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, salt): the hot key now occupies up to
    ``salt_buckets`` partitions instead of one.  The partition count is
    explicit — AQE would otherwise coalesce small shuffles back into
    few partitions and defeat the spread."""
    s = salt_col(salt_buckets, F.col(id_col) if id_col else None)
    return (df.withColumn("_salt", s)
            .repartition(num_partitions or salt_buckets,
                         F.col(key), F.col("_salt")))


def salted_group_agg(df: DataFrame, key: str, aggs: dict[str, str], *,
                     salt_buckets: int = 32,
                     id_col: str | None = None) -> DataFrame:
    """Two-level skew-safe groupBy for algebraic aggregates
    (count/sum/min/max): aggregate (key, salt) first, then combine the
    per-salt partials per key."""
    s = salt_col(salt_buckets, F.col(id_col) if id_col else None)
    first = [getattr(F, fn)(F.col(c)).alias(f"{c}__{fn}")
             for c, fn in aggs.items()]
    partial = (df.withColumn("_salt", s)
               .groupBy(F.col(key), F.col("_salt"))
               .agg(*first))
    combine_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    second = [getattr(F, combine_fn[fn])(F.col(f"{c}__{fn}")).alias(f"{c}_{fn}")
              for c, fn in aggs.items()]
    return partial.groupBy(F.col(key)).agg(*second)
