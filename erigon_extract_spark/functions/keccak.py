"""Keccak-256 (the pre-NIST Ethereum variant) as an Arrow-batched UDF —
SURVEY.md F8. The reference carries this hash behind ``#if 0`` (it computed
hashed-trie keys; erigon_extract.c keeps the call sites disabled), so no
output depends on it; it is provided for inventory completeness and for
pipelines that need address/slot hashing (e.g. hashed-state layouts).

Implementation: the standard Keccak-f[1600] permutation from the public
Keccak specification, with the 0x01 domain padding (NOT sha3's 0x06 — the
difference is exactly why Ethereum's empty-code hash c5d24601... differs
from NIST SHA3-256 of empty input). Pure Python on small inputs inside a
pandas UDF: addresses/slots are 20-32 bytes, one permutation call each —
the cost is the Python loop, amortized by Arrow batching; a 100 TB hashed-
state job would swap in a native kernel behind the same column signature.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ROUNDS = 24
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_M64 = (1 << 64) - 1


def _rol(x: int, n: int) -> int:
    n %= 64
    return ((x << n) | (x >> (64 - n))) & _M64


def _keccak_f(state: list[int]) -> None:
    for rnd in range(_ROUNDS):
        # theta
        c = [
            state[x] ^ state[x + 5] ^ state[x + 10] ^ state[x + 15] ^ state[x + 20]
            for x in range(5)
        ]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] ^= d[x]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rol(
                    state[x + 5 * y], _ROT[x][y]
                )
        # chi
        for x in range(5):
            for y in range(5):
                state[x + 5 * y] = b[x + 5 * y] ^ (
                    (~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y] & _M64
                )
        # iota
        state[0] ^= _RC[rnd]


def keccak256_bytes(data: bytes) -> bytes:
    """Keccak-256 digest (rate 136, capacity 512, 0x01 domain padding)."""
    rate = 136
    state = [0] * 25
    # pad10*1 with the Keccak (pre-NIST) 0x01 domain byte
    padded = bytearray(data)
    padded.append(0x01)
    while len(padded) % rate != 0:
        padded.append(0x00)
    padded[-1] |= 0x80
    for block_at in range(0, len(padded), rate):
        block = padded[block_at : block_at + rate]
        for i in range(rate // 8):
            state[i] ^= int.from_bytes(block[i * 8 : (i + 1) * 8], "little")
        _keccak_f(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out


@F.pandas_udf(T.BinaryType())
def keccak256(data: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else keccak256_bytes(bytes(b)) for b in data]
    )
