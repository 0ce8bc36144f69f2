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


def test_compact_parquet_reduces_files_and_preserves_rows(spark, sf_dir, tmp_path):
    """64-way over-partitioned write -> compaction to a handful of sorted
    files: same rows, far fewer files, and within-file sort restores
    row-group min/max selectivity."""
    from erigon_extract_spark.sources.compact import compact_parquet, data_files

    src = str(tmp_path / "scattered")
    dst = str(tmp_path / "compacted")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(64).write.parquet(src)
    assert len(data_files(spark, src)) == 64

    # in-place / nested rewrite would let mode('overwrite') destroy the
    # dataset being read -> refused before any job starts
    import pytest

    with pytest.raises(ValueError):
        compact_parquet(spark, src, src)
    with pytest.raises(ValueError):
        compact_parquet(spark, src, src + "/sub")

    n_files = compact_parquet(
        spark, src, dst, target_rows_per_file=200, sort_cols=["doc_id"]
    )
    files = data_files(spark, dst)
    assert len(files) == n_files < 64

    a = sorted(r.doc_id for r in spark.read.parquet(src).collect())
    b = sorted(r.doc_id for r in spark.read.parquet(dst).collect())
    assert a == b
    # sorted rewrite: each file covers a disjoint doc_id range
    import pyarrow.parquet as pq

    spans = []
    for f in files:
        md = pq.ParquetFile(f.replace("file:", "")).metadata
        ids = [
            (md.row_group(i).column(0).statistics.min,
             md.row_group(i).column(0).statistics.max)
            for i in range(md.num_row_groups)
        ]
        spans.append((min(x for x, _ in ids), max(y for _, y in ids)))
    spans.sort()
    assert all(spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1))


def test_file_stats_detects_then_compaction_clears_fragmentation(
    spark, tmp_path
):
    """The full maintenance loop: file_stats flags the fragments on the
    skewed fixture layout, compact_parquet rewrites, and a second
    file_stats pass reports zero small files with total rows preserved."""
    from erigon_extract_spark.sources.compact import (
        FILESTATS_SHARDS,
        compact_parquet,
        ensure_filestats_fixture,
        file_stats,
    )

    src = ensure_filestats_fixture(tmp_path / "frag")
    before = {r.file_name: r for r in file_stats(spark, str(src)).collect()}
    assert len(before) == len(FILESTATS_SHARDS)
    assert sum(r.n_rows for r in before.values()) == sum(FILESTATS_SHARDS)
    assert sum(r.is_small for r in before.values()) == 3
    # ranks: deterministic (n_rows desc, name asc)
    ranked = sorted(before.values(), key=lambda r: r.file_rank)
    assert [r.file_name for r in ranked[:2]] == [
        "shard0.parquet", "shard1.parquet",
    ]

    out = tmp_path / "compacted"
    compact_parquet(
        spark, str(src), str(out), target_rows_per_file=1500,
        sort_cols=["doc_id"],
    )
    after = file_stats(spark, str(out)).collect()
    assert sum(r.n_rows for r in after) == sum(FILESTATS_SHARDS)
    assert all(not r.is_small for r in after)
    assert len(after) < len(before)
