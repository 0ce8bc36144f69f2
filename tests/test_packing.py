"""Sequence packing + mixture sampling: hand-checked semantics and the
determinism/stability properties that make them usable at 100 TB."""

from __future__ import annotations

from pyspark.sql import functions as F

from erigon_extract_spark.operators.packing import pack_sequences
from erigon_extract_spark.operators.sampling import mixture_sample


def test_pack_sequences_hand_checked(spark):
    # one shard (n_shards=1), budget 5 tokens; docs in id order with
    # 3, 4, 2, 6 tokens → exclusive cumsums 0, 3, 7, 9
    rows = [
        (1, "a b c"),
        (2, "d e f g"),
        (3, "h i"),
        (4, "j k l m n o"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in pack_sequences(df, context_tokens=5, n_shards=1).collect()
    }
    assert (got[1]["chunk_id"], got[1]["chunk_offset"]) == (0, 0)
    assert (got[2]["chunk_id"], got[2]["chunk_offset"]) == (0, 3)
    assert (got[3]["chunk_id"], got[3]["chunk_offset"]) == (1, 2)
    assert (got[4]["chunk_id"], got[4]["chunk_offset"]) == (1, 4)
    assert got[4]["n_tokens"] == 6


def test_pack_sequences_append_only_stability(spark):
    """Adding documents with LARGER ids must not move any existing
    assignment — the property that lets an incremental corpus build reuse
    yesterday's packed chunks."""
    base = [(i, "w " * (i % 7 + 1)) for i in range(1, 40)]
    df1 = spark.createDataFrame(base, "doc_id long, text string")
    df2 = spark.createDataFrame(
        base + [(i, "x y z") for i in range(40, 60)], "doc_id long, text string"
    )
    a = {r["doc_id"]: (r["chunk_id"], r["chunk_offset"])
         for r in pack_sequences(df1, context_tokens=16, n_shards=4).collect()}
    b = {r["doc_id"]: (r["chunk_id"], r["chunk_offset"])
         for r in pack_sequences(df2, context_tokens=16, n_shards=4).collect()}
    assert all(b[k] == v for k, v in a.items())


def test_mixture_sample_is_deterministic_subset(spark):
    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        (F.lit(100) + (F.col("id") % 5) * 100).alias("rate"),
    )
    kept1 = {r["doc_id"] for r in mixture_sample(docs, "doc_id", F.col("rate")).collect()}
    kept2 = {r["doc_id"] for r in mixture_sample(
        docs.repartition(7), "doc_id", F.col("rate")).collect()}
    assert kept1 == kept2  # partitioning-independent membership
    # doubling every rate keeps a superset
    kept_hi = {r["doc_id"] for r in mixture_sample(
        docs.withColumn("rate", F.col("rate") * 2), "doc_id", F.col("rate")
    ).collect()}
    assert kept1 <= kept_hi
    # rough rate sanity: mean keep rate is sum(rates)/1000 per-mille
    expected = sum(100 + (i % 5) * 100 for i in range(1000)) / 1000 / 1000
    assert abs(len(kept1) / 1000 - expected) < 0.08


def test_pack_sequences_tokens_col_overrides_heuristic(spark):
    from pyspark.sql import functions as F

    from erigon_extract_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(0, "one two three", 100), (8, "x", 2000), (16, "a b", 100)],
        "doc_id long, text string, n_custom long",
    )
    # all ids ≡ 0 mod 8 -> same shard; packing must follow n_custom
    out = {r.doc_id: r for r in pack_sequences(
        docs, context_tokens=1024, tokens_col="n_custom"
    ).collect()}
    assert out[0].n_tokens == 100 and out[0].chunk_id == 0
    assert out[8].n_tokens == 2000
    assert out[8].chunk_offset == 100  # cumulative of doc 0
    assert out[16].chunk_id == (100 + 2000) // 1024 == 2
    # default path still the whitespace heuristic
    ws = {r.doc_id: r.n_tokens for r in pack_sequences(docs).collect()}
    assert ws == {0: 3, 8: 1, 16: 2}


def test_length_bucket_batches_waste_bound_and_stability(spark):
    from erigon_extract_spark.operators.packing import length_bucket_batches

    docs = spark.createDataFrame(
        [(i, "w " * ((i * 37) % 300 + 1)) for i in range(200)],
        "doc_id long, text string",
    )
    out = length_bucket_batches(docs, batch_tokens=256, n_shards=4).collect()
    assert len(out) == 200
    for r in out:
        # band invariant: 2^band <= n_tokens < 2^(band+1)
        assert (1 << r.band) <= r.n_tokens < (1 << (r.band + 1))
        # batch capacity respected: batch_size <= max(1, 256 >> (band+1))
        assert r.batch_size <= max(1, 256 >> (r.band + 1))
        assert r.batch_max_tokens >= r.n_tokens
    # padding waste bound: pad-to-batch-max wastes < 50% of batch budget
    from collections import defaultdict
    batches = defaultdict(list)
    for r in out:
        batches[(r.band, r.shard, r.batch_idx)].append(r)
    for rows in batches.values():
        mx = max(r.n_tokens for r in rows)
        total = sum(r.n_tokens for r in rows)
        assert total >= len(rows) * mx / 2  # every member >= band floor

    # append stability: adding HIGHER ids never moves existing assignments
    more = spark.createDataFrame(
        [(i, "w " * ((i * 37) % 300 + 1)) for i in range(260)],
        "doc_id long, text string",
    )
    out2 = {r.doc_id: (r.band, r.shard, r.batch_idx)
            for r in length_bucket_batches(
                more, batch_tokens=256, n_shards=4).collect()}
    for r in out:
        assert out2[r.doc_id] == (r.band, r.shard, r.batch_idx)


def test_negative_ids_get_nonnegative_shards(spark):
    """ADVICE r4 (low): `id % n` in Spark keeps the dividend's sign, so
    a negative doc_id produced a negative shard label. Both packers now
    use pmod — shard is always in [0, n_shards)."""
    from erigon_extract_spark.operators.packing import (
        length_bucket_batches,
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(-7, "a b c"), (-1, "d e"), (0, "f"), (5, "g h i j")],
        "doc_id long, text string",
    )
    for out in (
        pack_sequences(df, n_shards=4).collect(),
        length_bucket_batches(df, batch_tokens=64, n_shards=4).collect(),
    ):
        assert len(out) == 4
        for r in out:
            assert 0 <= r.shard < 4, (r.doc_id, r.shard)
