"""Streaming W4: closed version intervals from an update stream, fed in two
micro-batches to prove state carries across batches."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from erigon_extract_spark.streaming.rekey import stream_rekey_versions

SCHEMA = pa.schema(
    [
        ("address", pa.binary()),
        ("block", pa.int64()),
        ("nonce", pa.int64()),
        ("balance", pa.binary()),
        ("incarnation", pa.int64()),
        ("code_hash", pa.binary()),
    ]
)

A1 = b"\x01" * 20
A2 = b"\x02" * 20


def _write_batch(d: str, name: str, rows: list[tuple]) -> None:
    cols = list(zip(*rows)) if rows else [[]] * 6
    pq.write_table(
        pa.table(
            {f.name: list(c) for f, c in zip(SCHEMA, cols)}, schema=SCHEMA
        ),
        f"{d}/{name}.parquet",
    )


@pytest.mark.parametrize("two_batches", [True])
def test_stream_rekey_versions(spark, two_batches):
    d = tempfile.mkdtemp(prefix="updates_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    try:
        # batch 1: a1 gets versions at blocks 10, 20; a2 at 5
        _write_batch(
            d, "b1",
            [
                (A1, 10, 1, b"\x01", 0, b"\x00" * 32),
                (A1, 20, 2, b"\x02", 0, b"\x00" * 32),
                (A2, 5, 7, b"\x07", 1, b"\xaa" * 32),
            ],
        )
        sink = tempfile.mkdtemp(prefix="versions_out_")

        def run_once():
            updates = spark.readStream.schema(
                "address binary, block long, nonce long, balance binary, "
                "incarnation long, code_hash binary"
            ).option("maxFilesPerTrigger", 1).parquet(d)
            out = stream_rekey_versions(updates)
            # parquet sink supports checkpoint recovery (memory sink doesn't)
            q = (
                out.writeStream.format("parquet")
                .option("path", sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(600), "availableNow stream timed out"
            return {
                (bytes(r.address), r.block_from, r.block_to, r.nonce)
                for r in spark.read.schema(
                    "address binary, block_from long, block_to long, nonce long, "
                    "balance binary, incarnation long, code_hash binary"
                ).parquet(sink).collect()
            }

        got1 = run_once()
        # only a1's first version is closed so far
        assert got1 == {(A1, 10, 20, 1)}

        # batch 2: a1 at 30 (closes the v@20), a2 at 9 (closes v@5 —
        # state carried across micro-batches via the checkpoint)
        _write_batch(
            d, "b2",
            [
                (A1, 30, 3, b"\x03", 0, b"\x00" * 32),
                (A2, 9, 8, b"\x08", 1, b"\xaa" * 32),
            ],
        )
        got2 = run_once()
        assert (A1, 20, 30, 2) in got2
        assert (A2, 5, 9, 7) in got2
        shutil.rmtree(sink, ignore_errors=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
