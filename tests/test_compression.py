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

from pyspark.sql import functions as F

from erigon_extract_spark.codec import encode_state_history
from erigon_extract_spark.fixtures import realistic_state_history_rows as _realistic_rows
from erigon_extract_spark.schemas import STATE_HISTORY


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


def test_sorted_parquet_within_2x_of_reference_dialect(spark):
    """The stronger claim: within 2x of what the REFERENCE itself would
    write (byte-exact full-history file, header + strategy-0 stream +
    restart pages). Measured r3: parquet is ~0.60x — it wins outright."""
    from tools.measure_compression import measure

    m = measure(spark)
    assert m["parquet_zstd_sorted_bytes"] <= 2.0 * m["ref_dialect_bytes"], m
    assert m["parquet_zstd_sorted_bytes"] <= 2.0 * m["opcode_stream_bytes"], m


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
