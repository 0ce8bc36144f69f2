"""Tx-bodies pipeline: RLP decode, fork dedup, explode-join assembly,
stats — against the fixture generator's ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erigon_extract_spark import fixtures as fxmod
from erigon_extract_spark.plans.txbodies import (
    assemble_tx_bodies,
    decode_bodies,
    txbodies_stats,
)
from erigon_extract_spark.schemas import BLOCK_BODIES, BLOCK_TRANSACTIONS


@pytest.fixture(scope="module")
def fx():
    return fxmod.generate(seed=7, n_addresses=5, n_blocks=100, n_body_blocks=80)


def test_decode_bodies_rlp(spark, fx):
    bodies = spark.createDataFrame(fx.block_bodies, BLOCK_BODIES)
    dec = decode_bodies(bodies)
    assert dec.filter(F.col("decode_error").isNotNull()).count() == 0
    # tx spans must be contiguous across blocks after fork-dedup: total span
    # of distinct blocks == number of tx rows
    n_txs = len(fx.block_transactions)
    span = (
        dec.dropDuplicates(["block"]).agg(F.sum("tx_amount").alias("s")).collect()
    )[0]["s"]
    assert span == n_txs


def test_assemble_matches_fixture(spark, fx):
    bodies = spark.createDataFrame(fx.block_bodies, BLOCK_BODIES)
    txs = spark.createDataFrame(fx.block_transactions, BLOCK_TRANSACTIONS)
    out = {r["block"]: r for r in assemble_tx_bodies(bodies, txs).collect()}

    # ground truth: re-derive (tx_index, tx_amount) per block by decoding
    # the RLP with the engine's pure-Python kernel
    from erigon_extract_spark.functions.decode import _decode_body_one

    tx_by_id = {i: rlp for i, rlp in fx.block_transactions}
    truth: dict[int, list[bytes]] = {}
    for block, _h, body in fx.block_bodies:
        if block in truth:
            continue
        tx_index, tx_amount, _u, err = _decode_body_one(body)
        assert err is None
        truth[block] = [tx_by_id[i] for i in range(tx_index, tx_index + tx_amount)]

    assert set(out) == set(truth)
    for block, expected in truth.items():
        got = [bytes(t) for t in (out[block]["txs"] or [])]
        assert got == expected, f"block {block}"


def test_txbodies_stats(spark, fx):
    bodies = spark.createDataFrame(fx.block_bodies, BLOCK_BODIES)
    txs = spark.createDataFrame(fx.block_transactions, BLOCK_TRANSACTIONS)
    row = txbodies_stats(bodies, txs).collect()[0]
    assert row["block_count"] == len({b for b, _, _ in fx.block_bodies})
    assert row["total_tx_bytes"] == sum(len(r) for _, r in fx.block_transactions)
    from collections import Counter

    per_block = Counter(b for b, _, _ in fx.block_bodies)
    assert row["fork_dup_blocks"] == sum(1 for c in per_block.values() if c > 1)


def test_txbodies_stats_plan_construction_is_lazy(spark, fx):
    """Building the stats plan must launch NO Spark job: an eager count at
    construction time costs a job per call and bakes a stale scalar into
    the plan (the r2 verdict flagged exactly that). Job-group scoping makes
    any action fired here attributable."""
    bodies = spark.createDataFrame(fx.block_bodies, BLOCK_BODIES)
    txs = spark.createDataFrame(fx.block_transactions, BLOCK_TRANSACTIONS)
    sc = spark.sparkContext
    sc.setJobGroup("txstats-plan-construct", "laziness probe")
    try:
        df = txbodies_stats(bodies, txs)
        jobs = sc.statusTracker().getJobIdsForGroup("txstats-plan-construct")
        assert list(jobs) == [], f"plan construction launched jobs: {jobs}"
    finally:
        sc.setJobGroup("", "")
    assert df.collect()  # the plan still executes on demand
