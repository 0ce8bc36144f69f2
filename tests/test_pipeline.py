"""End-to-end domain pipeline: raw Erigon-shaped fixtures → decoded frames →
state_history → as-of queries, verified against the pure-Python oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erigon_extract_spark import fixtures as fxmod
from erigon_extract_spark.operators.asserts import assert_empty, assert_unique_keys
from erigon_extract_spark.plans.extract import (
    code_hash_inconsistencies,
    decode_account_changesets,
    decode_storage_changesets,
    recover_code_hashes,
    split_plain_state,
)
from erigon_extract_spark.plans.state import account_state_at, storage_state_at
from erigon_extract_spark.plans.transpose import build_state_history
from erigon_extract_spark.schemas import (
    ACCOUNT_CHANGESETS,
    PLAIN_CODE_HASH,
    PLAIN_STATE,
    STORAGE_CHANGESETS,
)


@pytest.fixture(scope="module")
def fx():
    return fxmod.generate(seed=42, n_addresses=18, n_blocks=250, n_body_blocks=40)


@pytest.fixture(scope="module")
def state_history(spark, fx):
    acs = spark.createDataFrame(fx.account_changesets, ACCOUNT_CHANGESETS)
    scs = spark.createDataFrame(fx.storage_changesets, STORAGE_CHANGESETS)
    ps = spark.createDataFrame(fx.plain_state, PLAIN_STATE)
    pch = spark.createDataFrame(fx.plain_code_hash, PLAIN_CODE_HASH)

    acct = decode_account_changesets(acs)
    assert_empty(acct.filter(F.col("decode_error").isNotNull()), "acct decode errors")
    acct = recover_code_hashes(acct.drop("decode_error"), pch)
    assert_empty(code_hash_inconsistencies(acct), "code-hash consistency")

    stor = decode_storage_changesets(scs)
    assert_empty(stor.filter(F.col("decode_error").isNotNull()), "stor decode errors")
    stor = stor.drop("decode_error")

    ps_acct_raw, ps_stor_raw = split_plain_state(ps)
    ps_acct = decode_account_changesets(
        ps_acct_raw.withColumnRenamed("account_blob", "account_blob")
    )
    ps_acct = recover_code_hashes(ps_acct.drop("decode_error"), pch)
    ps_stor = decode_storage_changesets(
        ps_stor_raw.withColumnRenamed("storage_blob", "storage_blob")
    ).drop("decode_error")

    sh = build_state_history(acct, stor, ps_acct, ps_stor, num_partitions=8)
    sh.cache()
    return sh


def _rows_to_set(rows):
    out = set()
    for r in rows:
        out.add(
            (
                bytes(r[0]),
                r[1],
                r[2],
                None if r[3] is None else bytes(r[3]),
                r[4],
                r[5],
                None if r[6] is None else bytes(r[6]),
                None if r[7] is None else bytes(r[7]),
                None if r[8] is None else bytes(r[8]),
            )
        )
    return out


def test_state_history_matches_oracle(state_history, fx):
    expected = set(fxmod.expected_state_history(fx))
    got = _rows_to_set(state_history.collect())
    missing = expected - got
    extra = got - expected
    assert not missing and not extra, (
        f"missing={list(missing)[:3]} extra={list(extra)[:3]} "
        f"(n_expected={len(expected)}, n_got={len(got)})"
    )


def test_state_history_key_unique(state_history):
    assert_unique_keys(
        state_history, ["address", "kind", "incarnation", "slot", "block_from"]
    )


@pytest.mark.parametrize("q_frac", [0.4, 1.0])
def test_account_state_at_matches_oracle(state_history, fx, q_frac):
    q_block = int(fx.latest_block * q_frac)
    oracle = fxmod.account_state_at_oracle(fx, q_block)
    got = {
        bytes(r["address"]): r
        for r in account_state_at(state_history, q_block).collect()
    }
    # Oracle includes every account whose first version <= q_block. The
    # engine additionally returns the pre-state zero row for accounts whose
    # first change is after q_block — filter those for comparison.
    for addr, v in oracle.items():
        assert addr in got, f"missing {addr.hex()}"
        r = got[addr]
        assert r["nonce"] == v.nonce
        assert int.from_bytes(bytes(r["balance"]), "big") == v.balance
        assert r["incarnation"] == v.incarnation
        assert bytes(r["code_hash"]) == v.code_hash


def test_storage_state_at_matches_oracle(state_history, fx):
    # Oracle: as-of over the (already verified) expected merge output. Note
    # slots whose final value is zero are absent from PlainState, so their
    # history ends at the previous version — the as-of answer must come from
    # the merged history semantics, not from raw write timelines.
    q_block = fx.latest_block // 2
    expected_rows = [r for r in fxmod.expected_state_history(fx) if r[1] == 1]
    best: dict[tuple, tuple] = {}
    for addr, kind, inc, slot, blk, _n, _b, _c, val in expected_rows:
        if blk <= q_block:
            key = (addr, inc, slot)
            if key not in best or blk > best[key][0]:
                best[key] = (blk, val)
    got = {
        (bytes(r["address"]), r["incarnation"], bytes(r["slot"])): (
            r["block_from"],
            bytes(r["value"]),
        )
        for r in storage_state_at(state_history, q_block).collect()
    }
    assert got == {k: (b, v) for k, (b, v) in best.items()}
