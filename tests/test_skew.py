"""Salted repartitioning for skewed keys."""

from pyspark.sql import functions as F

from jesse_spark.operators.skew import salted_group_agg, salted_repartition


def _skewed_df(spark):
    # 90% of rows share one key — the clips table's sr_hz/codec shape
    return spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))).alias("k"),
        F.col("id").alias("id"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_repartition_spreads_hot_key(spark):
    df = _skewed_df(spark)
    parts = (salted_repartition(df, "k", salt_buckets=16, id_col="id")
             .filter(F.col("k") == "hot")
             .groupBy(F.spark_partition_id().alias("p"))
             .count())
    rows = parts.collect()
    assert len(rows) > 1, "hot key must span multiple partitions"
    assert max(r["count"] for r in rows) < 9000


def test_salted_group_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = {(r["k"]): (r["cnt"], r["s"]) for r in
             df.groupBy("k").agg(F.count("v").alias("cnt"),
                                 F.sum("v").alias("s")).collect()}
    salted = {(r["k"]): (r["v_count"], r["v_sum"]) for r in
              salted_group_agg(df, "k", {"v": "count"}, id_col="id")
              .join(salted_group_agg(df, "k", {"v": "sum"}, id_col="id"), "k")
              .collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-6
