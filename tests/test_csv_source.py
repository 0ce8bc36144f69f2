"""CSV source: contract schema, RFC 4180 quoting, quarantine routing."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_csv_sample_roundtrip_values(spark, tmp_path):
    from erigon_extract_spark.sources.csvfile import (
        ensure_sample,
        read_documents_csv,
        split_quarantine,
    )

    path = ensure_sample(tmp_path / "docs.csv")
    clean, bad = split_quarantine(read_documents_csv(spark, str(path)))
    rows = {r.doc_id: r for r in clean.collect()}
    assert len(rows) == 50
    # doubled-quote convention: the quoted span must come back with BARE
    # quotes (Spark's backslash default would return the doubled form)
    assert rows[5].text == 'row 5, with a comma and a "quoted" span 5'
    assert rows[1].text == "row 1, with a comma"
    assert all(r.n_chars == len(r.text) for r in rows.values())
    assert bad.where(F.col("_corrupt").isNotNull()).collect() == []


def test_csv_corrupt_lines_quarantined_not_fatal(spark, tmp_path):
    from erigon_extract_spark.sources.csvfile import (
        read_documents_csv,
        split_quarantine,
    )

    p = tmp_path / "mixed.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        '1,"ok, text",en,src0,8\n'
        "not-a-number,broken,xx\n"  # wrong arity AND bad type
        '3,"also ok",fr,src1,7\n'
    )
    clean, bad = split_quarantine(read_documents_csv(spark, str(p)))
    assert sorted(r.doc_id for r in clean.collect()) == [1, 3]
    # full-row collect: projecting only _corrupt trips SPARK-21610 (see
    # split_quarantine docstring in sources/jsonl.py)
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert "not-a-number" in bad_rows[0]._corrupt


def test_csv_reader_stays_splittable(spark, tmp_path):
    # no multiLine: a single file must plan more than one partition when
    # maxPartitionBytes forces a split — the property multiLine destroys
    from erigon_extract_spark.sources.csvfile import read_documents_csv

    p = tmp_path / "big.csv"
    with open(p, "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        for i in range(20000):
            f.write(f'{i},"text {i}, padded {"x" * 50}",en,src0,60\n')
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        df = read_documents_csv(spark, str(p))
        assert df.rdd.getNumPartitions() > 1
        assert df.count() == 20000
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_csv_stream_available_now_matches_batch(spark, tmp_path):
    """Streaming CSV ingest (file-drop pattern) over two landed shards
    equals the batch read of the same directory — schema, quarantine,
    and quoting behave identically in both engines."""
    import shutil
    import tempfile

    from erigon_extract_spark.sources.csvfile import (
        ensure_sample,
        read_documents_csv,
        read_documents_csv_stream,
        split_quarantine,
    )

    d = tmp_path / "landing"
    d.mkdir()
    ensure_sample(d / "shard0.csv")
    # second shard: ids offset, one corrupt line to prove quarantine
    # flows through the stream too
    (d / "shard1.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        '100,"late, shard",en,src9,11\n'
        "garbage-line-without-fields\n"
    )
    clean_stream, _ = split_quarantine(
        read_documents_csv_stream(spark, str(d))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_csv_")
    try:
        q = (
            clean_stream.writeStream.format("memory")
            .queryName("csv_stream_t")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "availableNow stream timed out"
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    streamed = {
        r.doc_id for r in spark.table("csv_stream_t").collect()
    }
    clean_batch, bad_batch = split_quarantine(
        read_documents_csv(spark, str(d))
    )
    assert streamed == {r.doc_id for r in clean_batch.collect()}
    assert 100 in streamed and len(streamed) == 51
    assert len(bad_batch.collect()) == 1
