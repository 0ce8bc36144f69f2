"""Compression-ratio sanity target from BASELINE.md: the sorted-Parquet
state-history layout (zstd) must land within ~2x of the engine's own
ad-hoc opcode-stream encoding on equivalent synthetic state history.

The reference's headline result is 8.6 TB -> 167 GiB via run-length
address suppression + delta-encoded blocks/nonces/balances
(erigon_extract.c:690-1013). Parquet gets the same class of wins from
RLE_DICTIONARY + DELTA_BINARY_PACKED + zstd only if the data arrives
SORTED by the state key — this test pins both that the ratio target
holds and that sorting is what buys it.
"""

from __future__ import annotations

import pathlib
import random

from pyspark.sql import functions as F

from erigon_extract_spark.codec import encode_state_history
from erigon_extract_spark.schemas import STATE_HISTORY


def _realistic_rows(n_addrs=150, seed=7):
    """State history with real-data-shaped redundancy: per-address runs of
    versions, small block gaps, incrementing nonces, near-constant balances,
    storage values with few significant bytes."""
    rng = random.Random(seed)
    out = []
    for _ in range(n_addrs):
        addr = rng.randbytes(20)
        code_hash = rng.randbytes(32) if rng.random() < 0.3 else b"\x00" * 32
        block, nonce, bal = 0, 0, rng.randint(0, 10**12)
        for _ in range(rng.randint(5, 60)):
            block += rng.randint(1, 300)
            nonce += rng.randint(0, 2)
            bal = max(0, bal + rng.randint(-(10**9), 10**9))
            out.append(
                (addr, 0, 1, None, block,
                 nonce, bal.to_bytes(32, "big"), code_hash, None)
            )
        for _ in range(rng.randint(0, 3)):
            slot = rng.randint(0, 50).to_bytes(32, "big")
            block = 0
            for _ in range(rng.randint(1, 20)):
                block += rng.randint(1, 500)
                val = rng.randint(0, 10**9).to_bytes(32, "big")
                out.append((addr, 1, 1, slot, block, None, None, None, val))
    return out


def _dir_bytes(path: str) -> int:
    return sum(
        p.stat().st_size
        for p in pathlib.Path(path).rglob("*.parquet")
        if p.is_file()
    )


def test_sorted_parquet_within_2x_of_opcode_stream(spark, tmp_path):
    rows = _realistic_rows()
    df = spark.createDataFrame(rows, STATE_HISTORY)
    state_key = ["address", "kind", "incarnation", "slot", "block_from"]

    df_sorted = df.repartitionByRange(4, "address", "kind", "slot").sortWithinPartitions(
        *state_key
    )

    codec_bytes = (
        encode_state_history(df_sorted).agg(F.sum(F.length("blob"))).collect()[0][0]
    )

    sorted_dir = str(tmp_path / "sorted")
    df_sorted.write.mode("overwrite").parquet(sorted_dir)
    sorted_bytes = _dir_bytes(sorted_dir)

    # the operative BASELINE.md target
    assert sorted_bytes <= 2.0 * codec_bytes, (
        f"sorted parquet {sorted_bytes}B vs codec {codec_bytes}B "
        f"(ratio {sorted_bytes / codec_bytes:.2f} > 2.0)"
    )


def test_sorting_is_load_bearing_for_compression(spark, tmp_path):
    rows = _realistic_rows()
    df = spark.createDataFrame(rows, STATE_HISTORY)

    sorted_dir = str(tmp_path / "sorted")
    (
        df.repartitionByRange(4, "address", "kind", "slot")
        .sortWithinPartitions("address", "kind", "incarnation", "slot", "block_from")
        .write.mode("overwrite")
        .parquet(sorted_dir)
    )
    shuffled_dir = str(tmp_path / "shuffled")
    # hash-repartition on a high-cardinality non-key column scatters the
    # per-address runs, simulating the block-major input order
    df.repartition(4, "block_from").write.mode("overwrite").parquet(shuffled_dir)

    assert _dir_bytes(sorted_dir) < _dir_bytes(shuffled_dir), (
        "address-major sort should strictly improve parquet compression"
    )
