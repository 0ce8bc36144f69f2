"""Streaming sessionization (applyInPandasWithState) must reproduce the
batch sessionize operator's assignment — in one shot and across replayed
chronological micro-batches (ids keep counting through the state store)."""

from __future__ import annotations

import os
import shutil
import tempfile
import time

import pytest

from erigon_extract_spark.operators.windows import sessionize
from erigon_extract_spark.streaming.sessionize import stream_sessionize

GAP = 3600


@pytest.fixture(scope="module")
def events_batch(spark, sf_dir):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", "event_id", "ts"
    )


def _run(out, name):
    ckpt = tempfile.mkdtemp(prefix="ckpt_sess_")
    try:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "availableNow stream timed out"
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def _batch_expected(events_batch):
    out = sessionize(
        events_batch, ["user_id"], "ts", gap_seconds=GAP,
        tiebreak_cols=["event_id"],
    )
    return {
        (r["user_id"], r["event_id"]): r["session_id"] for r in out.collect()
    }


def test_stream_sessionize_matches_batch_single_file(
    spark, sf_dir, events_batch
):
    d = tempfile.mkdtemp(prefix="sess_stream_")
    try:
        shutil.copy(f"{sf_dir}/events.parquet", f"{d}/events.parquet")
        stream = spark.readStream.schema(
            spark.read.parquet(f"{sf_dir}/events.parquet").schema
        ).parquet(d)
        out = stream_sessionize(stream, gap_seconds=GAP)
        _run(out, "sess_one")
        got = {
            (r.user_id, r.event_id): r.session_id
            for r in spark.sql("SELECT * FROM sess_one").collect()
        }
        want = _batch_expected(events_batch)
        assert got == want and len(want) > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_sessionize_ids_continue_across_batches(
    spark, sf_dir, events_batch
):
    """Split the events chronologically into two files and replay them as
    separate micro-batches: session ids must continue through the state
    store and equal the single-batch assignment exactly."""
    from pyspark.sql import functions as F

    tick = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)"
    )
    med = events_batch.agg(
        F.percentile_approx(tick, 0.5).alias("m")
    ).collect()[0]["m"]
    d = tempfile.mkdtemp(prefix="sess_stream2_")
    try:
        early = events_batch.filter(tick <= med)
        late = events_batch.filter(tick > med)
        early.coalesce(1).write.mode("overwrite").parquet(f"{d}/b1")
        time.sleep(1.1)  # file-source orders by modification time
        late.coalesce(1).write.mode("overwrite").parquet(f"{d}/b2")
        for sub in ("b1", "b2"):
            for f in os.listdir(f"{d}/{sub}"):
                if f.endswith(".parquet"):
                    shutil.move(f"{d}/{sub}/{f}", f"{d}/{sub}.parquet")
        now = time.time()
        os.utime(f"{d}/b1.parquet", (now - 120, now - 120))
        os.utime(f"{d}/b2.parquet", (now, now))
        shutil.rmtree(f"{d}/b1", ignore_errors=True)
        shutil.rmtree(f"{d}/b2", ignore_errors=True)

        stream = (
            spark.readStream.schema(events_batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        out = stream_sessionize(stream, gap_seconds=GAP)
        _run(out, "sess_two")
        got = {
            (r.user_id, r.event_id): r.session_id
            for r in spark.sql("SELECT * FROM sess_two").collect()
        }
        want = _batch_expected(events_batch)
        assert got == want
    finally:
        shutil.rmtree(d, ignore_errors=True)
