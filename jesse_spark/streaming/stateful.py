"""Custom stateful streaming operator: per-key violation streaks.

The reference has no streaming at all; this is north-star surface — the
``applyInPandasWithState`` slot for operators the built-in windowed
aggregates cannot express.  A *consecutive-invalid streak* is the
canonical example: whether a key is quarantined depends on the ORDER of
its rows across micro-batches, which no groupBy aggregate carries.

State per key: (rows, invalid_rows, streak, quarantined).  A key whose
streak of invalid rows reaches ``quarantine_after`` is flagged
quarantined and stays flagged (sticky) — the upstream feed for that
key needs human attention even if later rows recover.

Rows are ordered by ``ts_col`` INSIDE each micro-batch — the whole
group is materialized and sorted once (a key's rows can span several
Arrow chunks whose relative order is arbitrary shuffle order, so
per-chunk sorting would be wrong); cross-batch order is the stream's
trigger order, as with any stateful streaming operator.  Memory note:
this buffers one key's per-trigger rows (3 narrow columns) — bound the
trigger interval, not the key cardinality, if a single key can exceed
executor memory in one trigger.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType([
    T.StructField("key", T.StringType()),
    T.StructField("rows", T.LongType()),
    T.StructField("invalid_rows", T.LongType()),
    T.StructField("streak", T.LongType()),
    T.StructField("quarantined", T.BooleanType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("rows", T.LongType()),
    T.StructField("invalid_rows", T.LongType()),
    T.StructField("streak", T.LongType()),
    T.StructField("quarantined", T.BooleanType()),
])


def violation_streaks(
    validated: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    valid_col: str = "valid",
    quarantine_after: int = 3,
) -> DataFrame:
    """``validated`` (streaming, post-:func:`validate_stream`) →
    one update row per key per trigger with the running streak state."""

    def track(key: tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            rows, invalid, streak, quarantined = state.get
        else:
            rows, invalid, streak, quarantined = 0, 0, 0, False
        # A key's rows within one micro-batch can span multiple Arrow
        # chunks (default ~10k rows each) and chunk-to-chunk order is
        # arbitrary shuffle order — sorting each chunk independently
        # would compute the streak in wrong row order for keys with
        # >1 chunk per trigger.  Materialize the whole group, sort once.
        chunks = list(pdfs)
        group = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        if len(group):
            group = group.sort_values(ts_col)
            for ok in group[valid_col].to_numpy():
                rows += 1
                if ok:
                    streak = 0
                else:
                    invalid += 1
                    streak += 1
                    if streak >= quarantine_after:
                        quarantined = True
        state.update((int(rows), int(invalid), int(streak), bool(quarantined)))
        yield pd.DataFrame([{
            "key": key[0], "rows": rows, "invalid_rows": invalid,
            "streak": streak, "quarantined": quarantined,
        }])

    return (
        validated.select(key_col, ts_col, valid_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            track,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def violation_streaks_batch(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    valid_col: str = "valid",
    tiebreak_cols: tuple[str, ...] = (),
    quarantine_after: int = 3,
) -> DataFrame:
    """Deterministic batch analog of :func:`violation_streaks` — the
    same sticky-quarantine verdicts computed over a complete, static
    table, as plain windows + aggregations (no Python in the plan).

    Gaps-and-islands: ``cum_valid`` (running count of valid rows in ts
    order) is constant across a run of consecutive invalid rows, so
    grouping invalid rows by (key, cum_valid) yields one group per
    run.  Then per key: ``quarantined`` iff any run >= quarantine_after
    (the streaming op's sticky flag — once a run reaches the threshold
    the key stays flagged), and ``streak`` is the trailing run (the
    island whose cum_valid equals the key's total valid count — i.e.
    the invalid rows after the LAST valid row), 0 if the key ends
    valid.

    Scale: one window shuffle on key (sorted within partition), then
    two spillable shrinking aggregations — no collect, no per-key
    buffers beyond the window sort.  ``tiebreak_cols`` makes the order
    total when ``ts_col`` can tie (pass the event id).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    valid_l = F.col(valid_col).cast("long")
    order = [F.col(ts_col)] + [F.col(c) for c in tiebreak_cols]
    w_cum = (Window.partitionBy(key_col).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy(key_col)
    base = (
        df.select(key_col, ts_col, valid_col, *tiebreak_cols)
        .withColumn("cum_valid", F.coalesce(F.sum(valid_l).over(w_cum),
                                            F.lit(0)))
        .withColumn("rows_total", F.count(F.lit(1)).over(w_all))
        .withColumn("n_valid", F.coalesce(F.sum(valid_l).over(w_all),
                                          F.lit(0)))
    )
    islands = (
        base.groupBy(
            key_col,
            F.when(~F.col(valid_col), F.col("cum_valid")).alias("island"))
        .agg(F.count(F.lit(1)).alias("run_len"),
             F.min("rows_total").alias("rows_total"),
             F.min("n_valid").alias("n_valid"))
    )
    return (
        islands.groupBy(key_col)
        .agg(
            F.min("rows_total").alias("rows"),
            (F.min("rows_total") - F.min("n_valid")).alias("invalid_rows"),
            F.coalesce(
                F.max(F.when(F.col("island") == F.col("n_valid"),
                             F.col("run_len"))),
                F.lit(0)).alias("streak"),
            F.coalesce(
                F.max(F.when(F.col("island").isNotNull(),
                             F.col("run_len"))) >= quarantine_after,
                F.lit(False)).alias("quarantined"),
        )
        .withColumnRenamed(key_col, "key")
    )
