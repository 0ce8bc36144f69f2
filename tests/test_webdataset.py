"""WebDataset tar shards: executor-side write, binaryFile+tarfile read,
round-trip fidelity, manifest reconciliation, null-row dead-lettering."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def test_webdataset_round_trip(spark, sf_dir, tmp_path):
    from erigon_extract_spark.sources.webdataset import (
        documents_to_shards,
        read_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "wds")
    manifest = documents_to_shards(spark, docs, out, n_shards=4).collect()
    assert len(manifest) == 4
    n_docs = docs.count()
    assert sum(r.n_samples for r in manifest) == n_docs
    assert all(r.n_bytes == os.path.getsize(os.path.join(out, r.shard))
               for r in manifest)

    back = read_shards(spark, out)
    assert back.count() == n_docs
    # payload fidelity: text bytes round-trip exactly; meta carries
    # lang/source
    orig = {str(r.doc_id): (r.text or "", r.lang, r.source)
            for r in docs.collect()}
    for r in back.collect():
        text, lang, source = orig[r.key]
        assert bytes(r.payload).decode() == text
        assert r.ext == "txt"
        meta = json.loads(r.meta)
        assert meta["lang"] == lang and meta["source"] == source


def test_webdataset_skips_null_rows(spark, tmp_path):
    from erigon_extract_spark.sources.webdataset import (
        read_shards,
        write_shards,
    )

    df = spark.createDataFrame(
        [("a", bytearray(b"alpha"), "txt", "en"),
         (None, bytearray(b"dropped"), "txt", "en"),
         ("c", None, "txt", "de")],
        "key string, payload binary, ext string, lang string",
    ).coalesce(1)
    out = str(tmp_path / "wds2")
    (m,) = write_shards(df, out, meta_cols=["lang"]).collect()
    assert m.n_samples == 1  # null key and null payload both skipped
    rows = read_shards(spark, out).collect()
    assert [r.key for r in rows] == ["a"]
    assert bytes(rows[0].payload) == b"alpha"
