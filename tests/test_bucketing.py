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


def test_block_partitioned_layout_prunes_at_planning_time(
    spark, tmp_path_factory
):
    """read_block_range must produce a NON-EMPTY PartitionFilter on the
    bucket key (directory pruning at planning time). A plain block filter
    can't: Catalyst won't invert block -> block_bucket on its own — that
    vacuity is asserted too, because it's the trap this helper exists
    to close."""
    import re

    from pyspark.sql import functions as F

    from erigon_extract_spark.sources.tables import (
        read_block_range,
        write_block_partitioned,
    )

    d = str(tmp_path_factory.mktemp("blkpart") / "acs")
    df = spark.range(0, 1_000).select(
        (F.col("id") * 1000).alias("block"),
        F.col("id").alias("payload"),
    )
    write_block_partitioned(df, d, blocks_per_bucket=100_000)

    def partition_filters(sdf) -> str:
        plan = sdf._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
        return m.group(1) if m else ""

    # the trap: a raw block predicate reads every directory
    naive = spark.read.parquet(d).filter(
        F.col("block").between(300_000, 499_999)
    )
    assert partition_filters(naive) == ""

    scoped = read_block_range(spark, d, 300_000, 499_999)
    assert "block_bucket" in partition_filters(scoped)
    # blocks 0..999000 span 10 buckets; the range covers buckets 3 and 4
    assert scoped.select("block_bucket").distinct().count() == 2
    assert scoped.count() == 200
    # same rows as the naive (unpruned) read
    assert naive.count() == 200
