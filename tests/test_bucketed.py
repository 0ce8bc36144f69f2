"""Bucketed-table source: co-location, pruning, and value round trip.

The scale claims sources/bucketed.py makes are PLAN properties, so they
are pinned here as plan assertions (the hash gate separately proves the
write+register round trip is value-lossless at sf0.01/sf0.1):

- same-key same-N bucketed join -> SortMergeJoin with ZERO Exchange
- groupBy(bucket_col) -> aggregate with ZERO Exchange
- equality predicate on the bucket column -> SelectedBucketsCount 1/N
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    from erigon_extract_spark.sources.bucketed import (
        register_bucketed,
        write_bucketed,
    )

    d = str(tmp_path_factory.mktemp("bkt"))
    fact = spark.range(4000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 200).alias("o_custkey")
    )
    dim = spark.range(200).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("seg"), F.col("id") % 5).alias("c_mktsegment"),
    )
    write_bucketed(fact, os.path.join(d, "f"), "o_custkey", 4, ["o_custkey"])
    write_bucketed(dim, os.path.join(d, "c"), "c_custkey", 4, ["c_custkey"])
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    ft = register_bucketed(
        spark, "t_bkt_fact", os.path.join(d, "f"), fact, "o_custkey", 4,
        ["o_custkey"],
    )
    dt = register_bucketed(
        spark, "t_bkt_dim", os.path.join(d, "c"), dim, "c_custkey", 4,
        ["c_custkey"],
    )
    return ft, dt


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    ft, dt = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = ft.join(dt, ft.o_custkey == dt.c_custkey)
        plan = _plan(j)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert j.count() == 4000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_no_exchange(spark, bucketed_pair):
    ft, _ = bucketed_pair
    agg = ft.groupBy("o_custkey").agg(F.count("*").alias("n"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 200


def test_bucketed_point_lookup_prunes_buckets(spark, bucketed_pair):
    _, dt = bucketed_pair
    pl = dt.filter(F.col("c_custkey") == 42)
    plan = _plan(pl)
    assert "SelectedBucketsCount: 1 out of 4" in plan, plan
    assert pl.count() == 1


def test_bucketed_write_one_file_per_bucket(spark, bucketed_pair, tmp_path):
    # sortBy metadata is only trusted when each bucket is a single file —
    # the writer's repartition guarantees it
    loc = spark.sql("DESCRIBE TABLE EXTENDED t_bkt_fact").collect()
    path = next(
        r["data_type"] for r in loc if r["col_name"] == "Location"
    ).replace("file:", "")
    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 4, files


def test_bucketed_roundtrip_values(spark, bucketed_pair):
    ft, _ = bucketed_pair
    got = sorted(
        (r.o_orderkey, r.o_custkey) for r in ft.collect()
    )
    assert got == [(i, i % 200) for i in range(4000)]


def test_register_rejects_unsafe_identifiers(spark):
    from erigon_extract_spark.sources.bucketed import _ident

    with pytest.raises(ValueError):
        _ident("evil; DROP TABLE x")


def test_dpp_runtime_prunes_fact_partitions(spark, sf_dir):
    """The quarter filter sits on the dim, so only DYNAMIC pruning can
    restrict the fact scan — assert the runtime IN-subquery reached the
    partition filters of the month-partitioned orders scan."""
    from erigon_extract_spark.queries import QUERIES

    df = QUERIES["source_partitioned_dpp"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert df.count() == 3
