"""Spark-side codec round trip: state_history → encoded blobs → decoded
rows, distributed via mapInPandas."""

from __future__ import annotations

from pyspark.sql import functions as F

from erigon_extract_spark.codec import decode_state_history, encode_state_history
from erigon_extract_spark.schemas import STATE_HISTORY


def _rows(n_addrs=30):
    import random

    rng = random.Random(3)
    out = []
    for _ in range(n_addrs):
        addr = rng.randbytes(20)
        block = 0
        for _ in range(rng.randint(1, 10)):
            block += rng.randint(1, 500)
            out.append(
                (addr, 0, 1, None, block, rng.randint(0, 9),
                 rng.randbytes(32), b"\x00" * 32, None)
            )
        slot = rng.randbytes(32)
        block = 0
        for _ in range(rng.randint(1, 5)):
            block += rng.randint(1, 500)
            out.append((addr, 1, 1, slot, block, None, None, None, rng.randbytes(32)))
    return out


def test_spark_codec_round_trip(spark):
    rows = _rows()
    df = (
        spark.createDataFrame(rows, STATE_HISTORY)
        .repartitionByRange(4, "address", "kind", "slot")
        .sortWithinPartitions("address", "kind", "incarnation", "slot", "block_from")
    )
    blobs = encode_state_history(df)
    assert blobs.count() <= 4
    decoded = decode_state_history(blobs)
    # set equality both directions (exceptAll mirrors the reference's
    # copy_file round-trip check, erigon_extract.c:2042-2100)
    a = df.select(*decoded.columns)
    assert decoded.exceptAll(a).count() == 0
    assert a.exceptAll(decoded).count() == 0
    # compression sanity: smaller than the raw fixed-width footprint
    blob_bytes = blobs.agg(F.sum(F.length("blob"))).collect()[0][0]
    assert blob_bytes < len(rows) * 141
