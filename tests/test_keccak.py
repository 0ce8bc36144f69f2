"""Keccak-256 (F8) — the reference keeps its call sites disabled, provided
here for inventory completeness. Vectors: the Keccak (pre-NIST, 0x01
padding) empty digest IS the engine's EMPTY_CODE_HASH constant, plus the
two most battle-tested constants in existence (the ERC-20 transfer
selector and Transfer event topic) and a multi-block input."""

from __future__ import annotations

from erigon_extract_spark.functions.keccak import keccak256, keccak256_bytes
from erigon_extract_spark.schemas import EMPTY_CODE_HASH


def test_known_vectors():
    assert keccak256_bytes(b"") == EMPTY_CODE_HASH
    assert (
        keccak256_bytes(b"abc").hex()
        == "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    assert keccak256_bytes(b"transfer(address,uint256)").hex()[:8] == "a9059cbb"
    assert (
        keccak256_bytes(b"Transfer(address,address,uint256)").hex()
        == "ddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )


def test_multiblock_and_rate_boundaries():
    # exactly one rate block (136B) forces the extra all-padding block;
    # 135/137 straddle the boundary
    for n in (135, 136, 137, 272, 1000):
        d1, d2 = keccak256_bytes(bytes(n)), keccak256_bytes(bytes(n))
        assert d1 == d2 and len(d1) == 32
    assert keccak256_bytes(bytes(135)) != keccak256_bytes(bytes(136))


def test_batch_lane_matches_scalar_reference():
    """The numpy batch lane must be bit-identical to the scalar spec
    implementation across empty/short/rate-boundary/multi-block inputs and
    interleaved nulls."""
    import random

    from erigon_extract_spark.functions.keccak import keccak256_batch

    rng = random.Random(11)
    msgs = [b"", b"abc", bytes(135), bytes(136), bytes(137), bytes(272)]
    msgs += [rng.randbytes(rng.randint(0, 500)) for _ in range(200)]
    with_nulls = [None, *msgs, None]
    got = keccak256_batch(with_nulls)
    assert got[0] is None and got[-1] is None
    for m, d in zip(msgs, got[1:-1]):
        assert d == keccak256_bytes(m), f"len={len(m)}"


def test_batch_lane_throughput_beats_scalar():
    """The point of the batch lane: amortize the permutation across rows.
    20k 32-byte keys must hash well under scalar-loop time (scalar runs
    a 24-round Python loop per row; batch runs 24 vectorized rounds per
    BATCH). Assert a conservative 5x to stay timing-robust in CI."""
    import random
    import time

    from erigon_extract_spark.functions.keccak import keccak256_batch

    rng = random.Random(5)
    keys = [rng.randbytes(32) for _ in range(20_000)]
    t0 = time.perf_counter()
    batch = keccak256_batch(keys)
    t_batch = time.perf_counter() - t0
    t0 = time.perf_counter()
    scalar = [keccak256_bytes(k) for k in keys[:2000]]
    t_scalar_per_row = (time.perf_counter() - t0) / 2000
    assert batch[:2000] == scalar
    assert t_batch < 5 * t_scalar_per_row * 20_000 / 5, (
        f"batch {t_batch:.2f}s vs scalar-projected "
        f"{t_scalar_per_row * 20_000:.2f}s"
    )


def test_udf_column(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(b"",), (b"abc",), (None,)], "payload binary"
    ).select(keccak256(F.col("payload")).alias("h"))
    got = [None if r.h is None else bytes(r.h) for r in df.collect()]
    assert got[0] == EMPTY_CODE_HASH
    assert got[1].hex().startswith("4e03657a")
    assert got[2] is None
