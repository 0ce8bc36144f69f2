"""Property-based tests (hypothesis) for the pure-Python kernels: the
codec round trip and the account-blob decoder. No Spark session needed —
these run fast and explore the byte-level edge cases the reference's
runtime asserts guarded (SURVEY.md §5 mechanism 3)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from erigon_extract_spark.codec.opstream import decode_blob, encode_rows
from erigon_extract_spark.fixtures import encode_account_blob, encode_storage_blob
from erigon_extract_spark.functions.decode import (
    _decode_account_one,
    _decode_storage_one,
)
from erigon_extract_spark.schemas import ZERO_HASH

# -- account blob: encode(decode) identity over the value domain ----------

account_values = st.tuples(
    st.integers(min_value=0, max_value=2**64 - 1),  # nonce
    st.integers(min_value=0, max_value=2**256 - 1),  # balance
    st.integers(min_value=0, max_value=2**64 - 1),  # incarnation
    st.one_of(st.just(ZERO_HASH), st.binary(min_size=32, max_size=32)),
)


@given(account_values)
@settings(max_examples=300, deadline=None)
def test_account_blob_round_trip(vals):
    nonce, balance, inc, ch = vals
    blob = encode_account_blob(nonce, balance, inc, ch)
    d_nonce, d_bal, d_inc, d_ch, err = _decode_account_one(blob)
    assert err is None
    assert d_nonce == nonce
    assert int.from_bytes(d_bal, "big") == balance
    assert d_inc == inc
    assert d_ch == ch


@given(st.binary(min_size=32, max_size=32), st.integers(0, 2**256 - 1))
@settings(max_examples=200, deadline=None)
def test_storage_blob_round_trip(slot, value):
    vb = value.to_bytes(32, "big")
    blob = encode_storage_blob(slot, vb)
    d_slot, d_val, err = _decode_storage_one(blob)
    assert err is None and d_slot == slot and d_val == vb


@given(st.binary(max_size=80))
@settings(max_examples=300, deadline=None)
def test_account_decoder_never_crashes(blob):
    """Arbitrary bytes either decode or produce a decode_error — never an
    exception (reference hard-errors; we report and let the job assert)."""
    out = _decode_account_one(blob)
    assert len(out) == 5


# -- opcode-stream codec: round trip over generated sorted row runs --------

addr = st.binary(min_size=20, max_size=20)
b32 = st.binary(min_size=32, max_size=32)


@st.composite
def sorted_state_rows(draw):
    rows = []
    n_addr = draw(st.integers(1, 6))
    addrs = sorted({draw(addr) for _ in range(n_addr)})
    for a in addrs:
        block = 0
        for _ in range(draw(st.integers(0, 5))):
            block += draw(st.integers(1, 10**6))
            rows.append(
                (
                    a, 0,
                    draw(st.integers(0, 3)),
                    None,
                    block,
                    draw(st.integers(0, 2**40)),
                    draw(b32),
                    draw(st.one_of(st.just(ZERO_HASH), b32)),
                    None,
                )
            )
        # distinct (incarnation, slot) version keys, emitted in sorted
        # order — the codec's contract is state-key-sorted input, and a
        # repeated key with a restarting block run would violate it (can't
        # happen in production: state keys are unique and globally sorted)
        n_slots = draw(st.integers(0, 3))
        pairs = draw(
            st.lists(
                st.tuples(st.integers(1, 3), b32),
                min_size=n_slots,
                max_size=n_slots,
                unique=True,
            )
        )
        for inc, slot in sorted(pairs):
            block = 0
            for _ in range(draw(st.integers(1, 4))):
                block += draw(st.integers(1, 10**6))
                rows.append((a, 1, inc, slot, block, None, None, None, draw(b32)))
    return rows


@given(sorted_state_rows())
@settings(max_examples=150, deadline=None)
def test_codec_round_trip_property(rows):
    blob, n, _ = encode_rows(rows)
    assert n == len(rows)
    assert decode_blob(blob) == rows
