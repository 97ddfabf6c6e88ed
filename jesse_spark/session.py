"""SparkSession factory with scale-appropriate defaults.

AQE on (runtime re-plan + skew-join splitting), Arrow on (every pandas
UDF crosses the JVM↔Python boundary in Arrow batches), shuffle
partitions sized for the local harness (cluster deploys override via
spark-submit conf)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "jesse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # modest Arrow batches: the clips table carries ~10-100 KB binary
        # payloads per row, so 10k-row batches would materialize multi-GB
        # buffers per task and thrash memory (measured 3-10x slowdown)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        # binary-payload rows are ~10-100 KB; the default 4096-row
        # columnar batch puts >100 MB per reader task on the heap and
        # OOMs at 32 concurrent tasks — 512 keeps batches ~tens of MB
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
