#!/usr/bin/env python
"""Measure the BASELINE.md compression target on a fixed corpus.

The reference's headline result is size: 8.6 TB of chain data down to
167 GiB via run-length address suppression + delta-encoded
blocks/nonces/balances (reference README.md:5-10, 191-197). The operative
target for this engine is that the general-purpose layout — SORTED
Parquet + zstd — lands within ~2x of the ad-hoc opcode encoding's bytes,
so adopting an open columnar format costs at most a small constant factor
over the bespoke stream.

Three encodings of the SAME realistic state-history corpus
(fixtures.realistic_state_history_rows):

- ``parquet_zstd_sorted``: repartitionByRange + sortWithinPartitions on
  the state key, zstd parquet (sources/tables.write_sorted_parquet path).
- ``opcode_stream``: the engine's own splittable opcode codec
  (codec/opstream.encode_state_history).
- ``ref_dialect``: the byte-exact reference full-history file
  (codec/refstream.encode_full_history_file — header + strategy-0 stream
  with 4 KiB restart pages), i.e. what the reference itself would write.

Usage: python tools/measure_compression.py   # prints one JSON line
"""

from __future__ import annotations

import json
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _dir_bytes(path: str) -> int:
    return sum(
        p.stat().st_size
        for p in pathlib.Path(path).rglob("*.parquet")
        if p.is_file()
    )


def measure(spark) -> dict:
    from pyspark.sql import functions as F

    from erigon_extract_spark import codec as opcodec
    from erigon_extract_spark.codec import refstream as rs
    from erigon_extract_spark.fixtures import realistic_state_history_rows
    from erigon_extract_spark.schemas import STATE_HISTORY, STATE_HISTORY_KEY

    rows = realistic_state_history_rows()
    df = spark.createDataFrame(rows, STATE_HISTORY)
    df_sorted = df.repartitionByRange(4, "address", "kind", "slot").sortWithinPartitions(
        *STATE_HISTORY_KEY
    )

    opcode_bytes = int(
        opcodec.encode_state_history(df_sorted)
        .agg(F.sum(F.length("blob")))
        .collect()[0][0]
    )

    with tempfile.TemporaryDirectory() as tmp:
        out = f"{tmp}/sorted"
        df_sorted.write.mode("overwrite").parquet(out)
        parquet_bytes = _dir_bytes(out)

    # reference merge order: state key (address, kind, incarnation, slot),
    # then block — accounts of an address precede its storage slots
    items = []
    max_block = 0
    for addr, kind, inc, slot, block, nonce, bal, ch, val in sorted(
        rows, key=lambda r: (r[0], r[1], r[2], r[3] or b"", r[4])
    ):
        max_block = max(max_block, block)
        if kind == 0:
            items.append(rs.AccountItem(block, addr, nonce, bal, inc, ch))
        else:
            items.append(rs.StorageItem(block, addr, inc, slot, val))
    ref_bytes = len(rs.encode_full_history_file(items, 0, max_block))

    return {
        "rows": len(rows),
        "parquet_zstd_sorted_bytes": parquet_bytes,
        "opcode_stream_bytes": opcode_bytes,
        "ref_dialect_bytes": ref_bytes,
        "parquet_over_opcode_ratio": round(parquet_bytes / opcode_bytes, 3),
        "parquet_over_ref_ratio": round(parquet_bytes / ref_bytes, 3),
    }


def main() -> None:
    from erigon_extract_spark.session import get_spark

    spark = get_spark(app_name="compression")
    print(json.dumps(measure(spark)))


if __name__ == "__main__":
    main()
