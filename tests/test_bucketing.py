"""Bucketed tables: a join on the bucket key must be shuffle-free.

This is the 100 TB pattern for repeatedly-joined fact tables (e.g. the
state-history table bucketed by address joined against per-address
features): pay the shuffle once at write time, never again.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bucketed_join_is_shuffle_free(spark, tmp_path_factory):
    li = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("k"), (F.col("id") * 2).alias("v1")
    )
    orders = spark.range(0, 500).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("v2")
    )
    spark.sql("DROP TABLE IF EXISTS bkt_li")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    li.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("bkt_li")
    orders.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
        "bkt_orders"
    )
    a = spark.table("bkt_li")
    b = spark.table("bkt_orders")
    # disable broadcast so the co-located sort-merge path is what's tested
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # bucketed both sides: no shuffle
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_li")
        spark.sql("DROP TABLE IF EXISTS bkt_orders")
