"""Round-trip tests for the opcode-stream codec (pure-Python kernels; the
Spark mapInPandas wrapper is exercised in test_codec_spark.py).

Mirrors the reference's own verification strategy: copy_file round-trips
encoded data to prove reader matches writer (reference comment
erigon_extract.c:2042-2046) — here decode(encode(rows)) == rows, plus
page-independence: decoding any whole-page suffix yields a suffix of the
rows (the property that makes the file seekable, erigon_extract.c:802-822).
"""

from __future__ import annotations

import random

from erigon_extract_spark.codec.opstream import (
    PAGE_SIZE,
    decode_blob,
    encode_rows,
)

ZERO32 = b"\x00" * 32


def _mk_rows(seed=7, n_addrs=40, versions=60):
    rng = random.Random(seed)
    rows = []
    for _ in range(n_addrs):
        addr = rng.randbytes(20)
        kind = rng.random() < 0.5
        block = 0
        nonce = rng.randint(0, 5)
        if not kind:
            for _ in range(rng.randint(1, versions)):
                block += rng.randint(1, 1000)
                nonce += rng.randint(0, 3)
                bal = rng.randbytes(rng.randint(0, 32)).rjust(32, b"\x00")
                inc = rng.randint(0, 3)
                ch = rng.randbytes(32) if rng.random() < 0.3 else ZERO32
                rows.append((addr, 0, inc, None, block, nonce, bal, ch, None))
        else:
            for _ in range(rng.randint(1, 5)):
                slot = rng.randbytes(32)
                block = 0
                for _ in range(rng.randint(1, 8)):
                    block += rng.randint(1, 1000)
                    val = (
                        (b"\x00" * rng.randint(0, 31)) + rng.randbytes(1)
                    ).rjust(32, b"\x00")
                    rows.append((addr, 1, rng.randint(1, 2), slot, block,
                                 None, None, None, val))
    return rows


def test_round_trip():
    rows = _mk_rows()
    blob, n, n_pages = encode_rows(rows)
    assert n == len(rows)
    decoded = decode_blob(blob)
    assert decoded == rows
    assert n_pages >= 1


def test_zero_account_round_trip():
    rows = [(b"\x01" * 20, 0, 0, None, 5, 0, ZERO32, ZERO32, None)]
    blob, _, _ = encode_rows(rows)
    assert decode_blob(blob) == rows


def test_compression_beats_raw():
    rows = _mk_rows(n_addrs=100, versions=100)
    blob, _, _ = encode_rows(rows)
    raw = sum(
        20 + 1 + 8 + 8 + 8 + 32 + 32 + 32 for _ in rows
    )  # fixed-width row size
    assert len(blob) < raw * 0.75, f"blob {len(blob)} vs raw {raw}"


def test_page_independence():
    """Every page boundary is a valid decode start: decoding the blob from
    page k onward must yield exactly the rows encoded after that boundary."""
    rows = _mk_rows(seed=11, n_addrs=60, versions=80)
    blob, _, n_pages = encode_rows(rows)
    assert n_pages > 2, "fixture too small to exercise paging"
    full = decode_blob(blob)
    for k in range(1, n_pages):
        tail = decode_blob(blob[k * PAGE_SIZE :])
        # address-run state resets at the boundary, so the tail decodes
        # standalone and must be a suffix of the full row list
        assert tail == full[len(full) - len(tail) :]
        assert len(tail) > 0 or k == n_pages - 1
