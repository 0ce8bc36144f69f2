"""Salted aggregation/join correctness vs the unsalted plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from erigon_extract_spark.operators.skew import (
    key_histogram,
    salted_agg,
    salted_join,
)


def test_salted_agg_matches_plain(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    plain = {
        r["k"]: (r["s"], r["c"], r["m"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("c"), F.max("v").alias("m"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"], r["m"])
        for r in salted_agg(
            df,
            ["k"],
            {"s": F.sum("v"), "c": F.count("*"), "m": F.max("v")},
            salt_buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    big = spark.range(0, 5_000).select((F.col("id") % 5).alias("k"), "id")
    small = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "c"), (9, "z")], "k long, tag string"
    )
    plain = big.join(small, "k").groupBy("k", "tag").count()
    salted = salted_join(big, small, ["k"], salt_buckets=4).groupBy("k", "tag").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_key_histogram(spark):
    df = spark.range(0, 100).select((F.col("id") % 10 == 0).alias("hot"))
    top = key_histogram(df, ["hot"], top=1).collect()
    assert top[0]["hot"] is False and top[0]["count"] == 90


def test_aqe_splits_skewed_join_partitions(spark):
    """100 TB readiness: with AQE skew-join on, a sort-merge join against a
    heavily skewed key set gets its oversized partitions split at runtime
    (OptimizeSkewedJoin marks them 'skewed'). Thresholds are lowered so the
    tiny fixture triggers the same code path production skew would."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        # force SMJ: broadcast would bypass the skew-join rule entirely
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # one hot key holding ~90% of rows, padded payload to trip the
        # byte threshold
        left = spark.range(0, 20000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pay"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        joined = left.join(right, "k")
        # collect() finalizes THIS DataFrame's adaptive plan (count() would
        # execute a separate aggregate query and leave this one unexecuted)
        n = len(joined.collect())
        assert n == 20000  # every left row matches exactly one right key

        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is not None:
                conf.set(k, v)


def test_salted_agg_rejects_non_decomposable_head(spark):
    """avg of partial avgs is wrong; the operator must raise, not mis-merge."""
    import pytest
    from pyspark.sql import functions as F
    from erigon_extract_spark.operators.skew import salted_agg

    df = spark.createDataFrame([(1, 2.0), (1, 4.0)], "k int, v double")
    with pytest.raises(ValueError, match="cannot infer"):
        salted_agg(df, ["k"], {"a": F.avg("v")}).collect()


def test_salted_agg_explicit_merge_for_avg(spark):
    from pyspark.sql import functions as F
    from erigon_extract_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(1, 2.0), (1, 4.0), (1, 9.0), (2, 5.0)], "k int, v double"
    )
    out = salted_agg(
        df,
        ["k"],
        {
            "s": (F.sum("v"), F.sum),
            "n": (F.count("v"), F.sum),
        },
        salt_buckets=4,
    ).withColumn("avg_v", F.col("s") / F.col("n"))
    got = {r.k: (r.s, r.n, r.avg_v) for r in out.collect()}
    assert got == {1: (15.0, 3, 5.0), 2: (5.0, 1, 5.0)}
