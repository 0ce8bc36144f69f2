"""Canonical-dump golden test (reference mechanism 2, SURVEY.md §5: the
print-equality oracle). The dump of the fixture pipeline is pinned; any
semantic drift in decode/rekey shows up as a diff here."""

from __future__ import annotations

import hashlib
from pathlib import Path

import pytest

from erigon_extract_spark import fixtures as fxmod
from erigon_extract_spark.operators.dump import dump_text
from erigon_extract_spark.plans.extract import (
    decode_account_changesets,
    decode_storage_changesets,
    recover_code_hashes,
    split_plain_state,
)
from erigon_extract_spark.plans.transpose import build_state_history
from erigon_extract_spark.schemas import (
    ACCOUNT_CHANGESETS,
    PLAIN_CODE_HASH,
    PLAIN_STATE,
    STORAGE_CHANGESETS,
)

GOLDEN = Path(__file__).parent / "golden" / "state_history_dump.sha256"


@pytest.fixture(scope="module")
def dump(spark):
    fx = fxmod.generate(seed=11, n_addresses=10, n_blocks=150, n_body_blocks=10)
    acs = spark.createDataFrame(fx.account_changesets, ACCOUNT_CHANGESETS)
    scs = spark.createDataFrame(fx.storage_changesets, STORAGE_CHANGESETS)
    ps = spark.createDataFrame(fx.plain_state, PLAIN_STATE)
    pch = spark.createDataFrame(fx.plain_code_hash, PLAIN_CODE_HASH)
    acct = recover_code_hashes(decode_account_changesets(acs).drop("decode_error"), pch)
    stor = decode_storage_changesets(scs).drop("decode_error")
    ps_a, ps_s = split_plain_state(ps)
    sh = build_state_history(
        acct,
        stor,
        recover_code_hashes(decode_account_changesets(ps_a).drop("decode_error"), pch),
        decode_storage_changesets(ps_s).drop("decode_error"),
        num_partitions=4,
    )
    return dump_text(sh)


def test_dump_shape(dump):
    lines = dump.strip().split("\n")
    assert len(lines) > 50
    assert all(ln.startswith(("A ", "S ")) for ln in lines)


def test_dump_matches_golden(dump):
    digest = hashlib.sha256(dump.encode()).hexdigest()
    if not GOLDEN.exists():
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(digest + "\n")
        pytest.skip("golden file created; rerun to verify")
    assert digest == GOLDEN.read_text().strip(), (
        "canonical dump changed — if intentional, delete tests/golden/"
        "state_history_dump.sha256 and rerun to re-pin"
    )
