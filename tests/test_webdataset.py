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


def test_webdataset_duplicate_payload_raises_both_sides(spark, tmp_path):
    """ADVICE r4 (low): two payload members for one key (key.jpg +
    key.txt — WebDataset permits it, this engine restricts to one) used
    to silently keep whichever appeared last. Now the writer rejects a
    duplicate key per shard and the reader rejects a second non-json
    member per stem — no silent data loss on either side."""
    import io
    import tarfile

    import pytest

    from erigon_extract_spark.sources.webdataset import (
        read_shards,
        write_shards,
    )

    # write side: duplicate key within a shard fails loudly
    df = spark.createDataFrame(
        [("k", bytearray(b"one"), "txt"), ("k", bytearray(b"two"), "jpg")],
        "key string, payload binary, ext string",
    ).coalesce(1)
    with pytest.raises(Exception, match="duplicate webdataset key"):
        write_shards(df, str(tmp_path / "dup")).collect()

    # read side: a foreign tar with key.jpg + key.txt fails loudly
    # (json sidecars stay fine alongside one payload)
    foreign = tmp_path / "foreign"
    foreign.mkdir()
    with tarfile.open(foreign / "shard-00000.tar", "w") as tar:
        for name, body in [(b"k.jpg", b"img"), (b"k.json", b"{}"),
                           (b"k.txt", b"txt")]:
            info = tarfile.TarInfo(name=name.decode())
            info.size = len(body)
            tar.addfile(info, io.BytesIO(body))
    with pytest.raises(Exception, match="duplicate payload members"):
        read_shards(spark, str(foreign)).collect()


def test_webdataset_duplicate_json_sidecar_raises(spark, tmp_path):
    """r5 review: the duplicate guard must cover .json members too — a
    second sidecar for one stem previously overwrote the first silently."""
    import io
    import tarfile

    import pytest

    from erigon_extract_spark.sources.webdataset import read_shards

    foreign = tmp_path / "dupjson"
    foreign.mkdir()
    with tarfile.open(foreign / "shard-00000.tar", "w") as tar:
        for name, body in [("k.txt", b"payload"), ("k.json", b"{}"),
                           ("k.json", b'{"v":2}')]:
            info = tarfile.TarInfo(name=name)
            info.size = len(body)
            tar.addfile(info, io.BytesIO(body))
    with pytest.raises(Exception, match="duplicate json sidecar"):
        read_shards(spark, str(foreign)).collect()
