"""Stream-vs-batch equivalence for the violation-streak operator at
table scale (VERDICT r4 advice #3).

The sf0.01 events table (10k rows, every user spanning many Arrow
chunks) is drained through the REAL ``applyInPandasWithState`` operator
as a multi-trigger file stream with adversarial intra-batch order, and
the final per-key state is diffed — field for field — against the
DuckDB-oracled batch analog ``violation_streaks_batch`` on the same
input.  The r3 chunk-ordering bug lived exactly on this seam
(stateful.py materialize-then-sort); small in-test corpora can miss
chunk-boundary bugs that only appear when a key's rows straddle many
chunks in one trigger.

Stream contract honored by the harness: WITHIN a trigger rows may
arrive in any order (the operator sorts); ACROSS triggers time must
move forward (trigger order is stream order) — so files are split on
contiguous ts ranges but shuffled internally.
"""

from __future__ import annotations

import time

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_streaks_stream_equals_batch_10k(spark, tmp_path):
    from jesse_spark.streaming import violation_streaks
    from jesse_spark.streaming.stateful import violation_streaks_batch

    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select(
            "event_id", "ts",
            F.col("user_id").cast("string").alias("user_id"),
            # valid = "not an error event", with injected NULL verdicts
            # (event_id % 97 == 0) to exercise the NULL ≡ invalid
            # coalesce on BOTH paths
            F.when(F.col("event_id") % 97 == 0, F.lit(None).cast("boolean"))
            .otherwise(~F.col("event_type").eqNullSafe(F.lit("error")))
            .alias("valid"),
        )
    )
    n_total = ev.count()
    assert n_total >= 10_000, n_total
    # ts-only ordering must be total per key, else stream (stable sort)
    # and batch (arbitrary SQL tie order) could legitimately differ
    assert ev.groupBy("user_id", "ts").count().filter("count > 1").count() == 0

    # ---- batch truth -----------------------------------------------------
    batch = {r["key"]: (r["rows"], r["invalid_rows"], r["streak"],
                        r["quarantined"])
             for r in violation_streaks_batch(
                 ev, key_col="user_id", ts_col="ts", valid_col="valid",
                 quarantine_after=3).collect()}

    # ---- adversarial stream layout ---------------------------------------
    # 6 contiguous ts slices (cross-trigger time moves forward), each
    # internally SHUFFLED (intra-trigger order is arbitrary); one file
    # per slice, appended in order so FileStreamSource (oldest mtime
    # first, maxFilesPerTrigger=1) replays them as 6 micro-batches
    src = str(tmp_path / "events_stream")
    sliced = ev.withColumn("_slice", F.ntile(6).over(Window.orderBy("ts")))
    for i in range(1, 7):
        (sliced.filter(F.col("_slice") == i).drop("_slice")
         .orderBy(F.hash("event_id"))       # shuffle within the slice
         .coalesce(1).write.mode("append").parquet(src))
        time.sleep(0.05)                    # distinct mtimes → file order

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch",
                          "10000")
    # 73-row chunks: every key's per-trigger rows straddle many chunks
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "73")
    try:
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        streaks = violation_streaks(
            stream, key_col="user_id", ts_col="ts", valid_col="valid",
            quarantine_after=3)
        q = (streaks.writeStream.format("memory")
             .queryName("streak_equiv_10k").outputMode("update")
             .trigger(availableNow=True).start())
        q.awaitTermination(300)
        # update-mode memory sink keeps one row per key per trigger;
        # `rows` grows monotonically, so max(rows) row == final state
        final: dict = {}
        for r in spark.sql("select * from streak_equiv_10k").collect():
            cur = final.get(r["key"])
            if cur is None or r["rows"] > cur[0]:
                final[r["key"]] = (r["rows"], r["invalid_rows"], r["streak"],
                                   r["quarantined"])
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    assert set(final) == set(batch)
    diffs = {k: (final[k], batch[k]) for k in batch if final[k] != batch[k]}
    assert not diffs, f"{len(diffs)} keys diverge: {dict(list(diffs.items())[:5])}"
    assert sum(v[0] for v in final.values()) == n_total
