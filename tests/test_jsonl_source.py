"""JSONL source: explicit-schema read, corrupt-line quarantine, round-trip."""

from __future__ import annotations

import json


def test_jsonl_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    from erigon_extract_spark.sources.jsonl import (
        read_documents_jsonl,
        split_quarantine,
    )

    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok one", "lang": "en",
                    "source": "a", "n_chars": 6}),
        '{"doc_id": 2, "text": "truncated',          # malformed JSON
        json.dumps({"doc_id": 3, "text": "ok three", "lang": "de",
                    "source": "b", "n_chars": 8}),
        "not json at all",
    ]
    p.write_text("\n".join(lines) + "\n")
    clean, bad = split_quarantine(read_documents_jsonl(spark, str(p)))
    got = {r.doc_id: r.text for r in clean.collect()}
    assert got == {1: "ok one", 3: "ok three"}
    quarantined = sorted(r._corrupt for r in bad.collect())
    assert quarantined == ["not json at all", '{"doc_id": 2, "text": "truncated']


def test_jsonl_roundtrip_preserves_values(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from erigon_extract_spark.sources.jsonl import (
        read_documents_jsonl,
        split_quarantine,
        write_documents_jsonl,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 100)
    )
    out = str(tmp_path / "rt")
    write_documents_jsonl(docs, out)
    clean, bad = split_quarantine(read_documents_jsonl(spark, out))
    # count() would prune to the corrupt column alone and trip
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN; collect keeps the full projection
    assert len(bad.collect()) == 0
    a = {r.doc_id: (r.text, r.lang, r.source, r.n_chars)
         for r in docs.collect()}
    b = {r.doc_id: (r.text, r.lang, r.source, r.n_chars)
         for r in clean.collect()}
    assert a == b


def test_jsonl_streaming_ingest_with_quarantine(spark, tmp_path):
    """The JSONL contract schema drives a STREAMING ingest too: corrupt
    lines surface as quarantine rows in the same micro-batch flow instead
    of killing the stream — the continuous-ingest path of the source."""
    import json
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from erigon_extract_spark.sources.jsonl import DOCUMENTS_SCHEMA

    d = tmp_path / "stream_in"
    d.mkdir()
    lines = [
        json.dumps({"doc_id": i, "text": f"doc {i}", "lang": "en",
                    "source": "s", "n_chars": 5}) for i in range(20)
    ] + ["corrupt {line", "another bad one"]
    (d / "batch1.jsonl").write_text("\n".join(lines) + "\n")

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(str(d))
    )
    # reference a typed column alongside _corrupt: a plan touching ONLY the
    # corrupt column is rejected (QUERY_ONLY_CORRUPT_RECORD_COLUMN), in
    # streaming just as in batch
    counted = stream.groupBy(
        F.col("_corrupt").isNotNull().alias("is_corrupt")
    ).agg(F.count("*").alias("count"), F.count("doc_id").alias("n_ids"))
    ckpt = tempfile.mkdtemp(prefix="ckpt_jsonl_")
    try:
        q = (
            counted.writeStream.format("memory")
            .queryName("jsonl_stream_t")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "availableNow stream timed out"
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    got = {r.is_corrupt: r["count"]
           for r in spark.sql("SELECT * FROM jsonl_stream_t").collect()}
    assert got == {False: 20, True: 2}
