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
