"""Incremental state-history maintenance: old store + append-only delta
must equal a full rebuild over all inputs (the reference's "can be updated
in place" aspiration, reference README.md:52-56 — its code only ever does a
full rebuild)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erigon_extract_spark import fixtures as fxmod
from erigon_extract_spark.operators.asserts import assert_empty
from erigon_extract_spark.plans.extract import (
    decode_account_changesets,
    decode_storage_changesets,
    recover_code_hashes,
)
from erigon_extract_spark.plans.incremental import (
    apply_increment,
    incremental_history_delta,
    seam_violations,
    zero_tombstones,
)
from erigon_extract_spark.plans.transpose import build_state_history
from erigon_extract_spark.schemas import (
    ACCOUNT_CHANGESETS,
    PLAIN_CODE_HASH,
    STORAGE_CHANGESETS,
)

T_SPLIT = 150

ACCT_PS_SCHEMA = (
    "block long, address binary, nonce long, balance binary, "
    "incarnation long, code_hash binary"
)
STOR_PS_SCHEMA = "block long, address binary, incarnation long, slot binary, value binary"


@pytest.fixture(scope="module")
def fx():
    return fxmod.generate(seed=7, n_addresses=20, n_blocks=250, n_body_blocks=10)


@pytest.fixture(scope="module")
def frames(spark, fx):
    acs = spark.createDataFrame(fx.account_changesets, ACCOUNT_CHANGESETS)
    scs = spark.createDataFrame(fx.storage_changesets, STORAGE_CHANGESETS)
    pch = spark.createDataFrame(fx.plain_code_hash, PLAIN_CODE_HASH)
    acct = recover_code_hashes(
        decode_account_changesets(acs).drop("decode_error"), pch
    )
    stor = decode_storage_changesets(scs).drop("decode_error")
    acct.cache(), stor.cache()
    return acct, stor


def _snapshot_frames(spark, fx, stor_decoded, at_block):
    psa = spark.createDataFrame(
        fxmod.account_snapshot_rows(fx, at_block), ACCT_PS_SCHEMA
    )
    pss = spark.createDataFrame(
        fxmod.storage_snapshot_rows(fx, at_block), STOR_PS_SCHEMA
    )
    tomb = zero_tombstones(stor_decoded, pss, at_block)
    return psa, pss.unionByName(tomb.select(*pss.columns))


def _canon(df):
    return set(
        map(
            tuple,
            df.select(
                F.hex("address"),
                "kind",
                "incarnation",
                F.hex("slot"),
                "block_from",
                "nonce",
                F.hex("balance"),
                F.hex("code_hash"),
                F.hex("value"),
            ).collect(),
        )
    )


def test_incremental_equals_full_rebuild(spark, fx, frames):
    acct, stor = frames
    acct_old = acct.filter(F.col("block") <= T_SPLIT)
    stor_old = stor.filter(F.col("block") <= T_SPLIT)
    acct_new = acct.filter(F.col("block") > T_SPLIT)
    stor_new = stor.filter(F.col("block") > T_SPLIT)

    psa_t, pss_t = _snapshot_frames(spark, fx, stor_old, T_SPLIT)
    old = build_state_history(acct_old, stor_old, psa_t, pss_t, num_partitions=4)
    old.cache()

    tip = fx.latest_block
    psa_tip, pss_tip = _snapshot_frames(spark, fx, stor, tip)
    full = build_state_history(acct, stor, psa_tip, pss_tip, num_partitions=4)

    assert_empty(seam_violations(old, acct_new, stor_new), "seam consistency")

    delta = incremental_history_delta(
        old, acct_new, stor_new, psa_tip, pss_tip
    )
    updated = apply_increment(old, delta, num_partitions=4)

    got, want = _canon(updated), _canon(full)
    assert got == want, (
        f"missing={list(want - got)[:3]} extra={list(got - want)[:3]}"
    )
    # the delta really is append-only: nothing in it was already stored,
    # and every new row comes from the delta (old ∩ delta = ∅, old ∪ delta = full)
    assert _canon(delta) & _canon(old) == set()
    assert _canon(delta) | _canon(old) == want


def test_empty_batch_empty_delta(spark, fx, frames):
    acct, stor = frames
    psa_t, pss_t = _snapshot_frames(
        spark, fx, stor.filter(F.col("block") <= T_SPLIT), T_SPLIT
    )
    old = build_state_history(
        acct.filter(F.col("block") <= T_SPLIT),
        stor.filter(F.col("block") <= T_SPLIT),
        psa_t,
        pss_t,
        num_partitions=4,
    )
    delta = incremental_history_delta(old, acct.limit(0), stor.limit(0))
    assert delta.count() == 0


def test_seam_violation_detected_on_gapped_batch(spark, fx, frames):
    """A batch that skips blocks (T..T+40 missing) no longer continues the
    store — the seam check must catch it (values at the seam differ)."""
    acct, stor = frames
    psa_t, pss_t = _snapshot_frames(
        spark, fx, stor.filter(F.col("block") <= T_SPLIT), T_SPLIT
    )
    old = build_state_history(
        acct.filter(F.col("block") <= T_SPLIT),
        stor.filter(F.col("block") <= T_SPLIT),
        psa_t,
        pss_t,
        num_partitions=4,
    )
    gapped_acct = acct.filter(F.col("block") > T_SPLIT + 40)
    gapped_stor = stor.filter(F.col("block") > T_SPLIT + 40)
    n = seam_violations(old, gapped_acct, gapped_stor).count()
    assert n > 0


def test_chained_increments_equal_full_rebuild(spark, fx, frames):
    """Two successive increments (T1, then T1->T2, then T2->tip) must land
    on exactly the full rebuild — the steady-state maintenance loop, not
    just one seam."""
    acct, stor = frames
    t1, t2, tip = 80, 160, fx.latest_block

    def span(lo, hi):
        return (
            acct.filter((F.col("block") > lo) & (F.col("block") <= hi)),
            stor.filter((F.col("block") > lo) & (F.col("block") <= hi)),
        )

    psa1, pss1 = _snapshot_frames(spark, fx, stor.filter(F.col("block") <= t1), t1)
    store = build_state_history(
        acct.filter(F.col("block") <= t1),
        stor.filter(F.col("block") <= t1),
        psa1, pss1, num_partitions=4,
    ).localCheckpoint()

    for lo, hi in ((t1, t2), (t2, tip)):
        a_new, s_new = span(lo, hi)
        psa_h, pss_h = _snapshot_frames(
            spark, fx, stor.filter(F.col("block") <= hi), hi
        )
        delta = incremental_history_delta(store, a_new, s_new, psa_h, pss_h)
        store = apply_increment(store, delta, num_partitions=4).localCheckpoint()

    psa_t, pss_t = _snapshot_frames(spark, fx, stor, tip)
    full = build_state_history(acct, stor, psa_t, pss_t, num_partitions=4)
    assert _canon(store) == _canon(full)


def test_derive_snapshot_at_matches_direct_snapshot(spark, fx, frames):
    """derive_snapshot_at (changeset stream + tip snapshot only) must
    reproduce the direct snapshot at the boundary for every touched key —
    including the zero32 storage tombstones — without reading any
    snapshot fixture at that block."""
    from erigon_extract_spark.plans.incremental import derive_snapshot_at

    acct, stor = frames
    b = T_SPLIT
    tip = fx.latest_block
    psa_tip = spark.createDataFrame(
        fxmod.account_snapshot_rows(fx, tip), ACCT_PS_SCHEMA
    )
    pss_tip = spark.createDataFrame(
        fxmod.storage_snapshot_rows(fx, tip), STOR_PS_SCHEMA
    )
    touched_a = acct.filter(
        (F.col("block") > 60) & (F.col("block") <= b)
    ).select("address")
    touched_s = stor.filter(
        (F.col("block") > 60) & (F.col("block") <= b)
    ).select("address", "incarnation", "slot")
    psa, pss = derive_snapshot_at(
        acct, stor, psa_tip, pss_tip, b,
        touched_accounts=touched_a, touched_storage=touched_s,
    )

    # direct snapshot (what PlainState held at b), restricted to touched
    direct_a = spark.createDataFrame(
        fxmod.account_snapshot_rows(fx, b), ACCT_PS_SCHEMA
    ).join(touched_a.distinct(), "address")
    direct_s_raw = spark.createDataFrame(
        fxmod.storage_snapshot_rows(fx, b), STOR_PS_SCHEMA
    )
    tomb = zero_tombstones(
        stor.filter(F.col("block") <= b), direct_s_raw, b
    )
    direct_s = (
        direct_s_raw.unionByName(tomb.select(*direct_s_raw.columns))
        .join(touched_s.distinct(), ["address", "incarnation", "slot"])
    )

    def canon_a(df):
        return set(map(tuple, df.select(
            "block", F.hex("address"), "nonce", F.hex("balance"),
            "incarnation", F.hex("code_hash")).collect()))

    def canon_s(df):
        return set(map(tuple, df.select(
            "block", F.hex("address"), "incarnation", F.hex("slot"),
            F.hex("value")).collect()))

    assert canon_a(psa) == canon_a(direct_a)
    assert canon_s(pss) == canon_s(direct_s)


def test_streaming_file_drop_maintenance_availablenow(spark, fx, frames, tmp_path):
    """The maintenance loop as a STREAM: changeset batches arrive as file
    drops (the crawler/CDC pattern), each micro-batch applies
    incremental_history_delta + apply_increment against the held store
    using only data available at its time (changesets <= boundary and
    the PlainState snapshot AT the boundary), and the final store equals
    the batch full rebuild. availableNow with maxFilesPerTrigger=1 makes
    micro-batch boundaries exactly the file drops."""
    acct, stor = frames
    t1, t2, tip = 80, 160, fx.latest_block

    # unified changeset shape so both feeds ride one drop directory
    def unified(a, s, boundary):
        ua = a.select(
            F.lit(0).alias("kind"), "block", "address", "nonce", "balance",
            "incarnation", "code_hash",
            F.lit(None).cast("binary").alias("slot"),
            F.lit(None).cast("binary").alias("value"),
            F.lit(boundary).cast("long").alias("boundary"),
        )
        us = s.select(
            F.lit(1).alias("kind"), "block", "address",
            F.lit(None).cast("long").alias("nonce"),
            F.lit(None).cast("binary").alias("balance"),
            "incarnation",
            F.lit(None).cast("binary").alias("code_hash"),
            "slot", "value",
            F.lit(boundary).cast("long").alias("boundary"),
        )
        return ua.unionByName(us)

    drops = tmp_path / "drops"
    drops.mkdir()
    for i, (lo, hi) in enumerate(((t1, t2), (t2, tip))):
        batch = unified(
            acct.filter((F.col("block") > lo) & (F.col("block") <= hi)),
            stor.filter((F.col("block") > lo) & (F.col("block") <= hi)),
            hi,
        )
        # write via Spark (pandas would upcast nullable int64 to double,
        # breaking the stream's declared schema), one file per drop
        stage = tmp_path / f"stage{i}"
        batch.coalesce(1).write.parquet(str(stage))
        part = next(stage.glob("part-*.parquet"))
        part.rename(drops / f"b{i}.parquet")

    psa1, pss1 = _snapshot_frames(spark, fx, stor.filter(F.col("block") <= t1), t1)
    store = [
        build_state_history(
            acct.filter(F.col("block") <= t1),
            stor.filter(F.col("block") <= t1),
            psa1, pss1, num_partitions=4,
        ).localCheckpoint()
    ]
    boundaries_seen = []

    def apply_batch(batch_df, _batch_id):
        if batch_df.isEmpty():
            return
        boundary = batch_df.agg(F.max("boundary")).collect()[0][0]
        boundaries_seen.append(boundary)
        a_new = batch_df.filter(F.col("kind") == 0).select(
            "block", "address", "nonce", "balance", "incarnation", "code_hash"
        )
        s_new = batch_df.filter(F.col("kind") == 1).select(
            "block", "address", "incarnation", "slot", "value"
        )
        psa_h, pss_h = _snapshot_frames(
            spark, fx, stor.filter(F.col("block") <= boundary), boundary
        )
        delta = incremental_history_delta(store[0], a_new, s_new, psa_h, pss_h)
        store[0] = apply_increment(
            store[0], delta, num_partitions=4
        ).localCheckpoint()

    schema = (
        "kind int, block long, address binary, nonce long, balance binary, "
        "incarnation long, code_hash binary, slot binary, value binary, "
        "boundary long"
    )
    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drops))
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "availableNow stream timed out"
    assert boundaries_seen == [t2, tip]  # one micro-batch per file drop
    psa_t, pss_t = _snapshot_frames(spark, fx, stor, tip)
    full = build_state_history(acct, stor, psa_t, pss_t, num_partitions=4)
    assert _canon(store[0]) == _canon(full)
