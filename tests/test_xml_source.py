"""XML source: contract schema, entity/CDATA decoding, attribute mapping,
quarantine routing, write round trip, streaming twin."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_xml_sample_decodes_entities_and_cdata(spark, tmp_path):
    from erigon_extract_spark.sources.xmlfile import (
        _LANGS,
        _sample_text,
        ensure_sample,
        read_documents_xml,
        split_quarantine,
    )

    path = ensure_sample(tmp_path / "docs.xml")
    clean, bad = split_quarantine(read_documents_xml(spark, str(path)))
    rows = {r.doc_id: r for r in clean.collect()}
    assert len(rows) == 50
    # entity path: &amp; / &lt; decode to bare characters
    assert rows[1].text == "row 1 & less < than 1"
    # CDATA path: raw markup comes back verbatim, not entity-mangled
    assert rows[5].text == "raw <b>bold 5</b> & amp"
    for i in range(50):
        assert rows[i].text == _sample_text(i)
        assert rows[i].lang == _LANGS[i % 4]
        assert rows[i].source == f"src{i % 3}"
        assert rows[i].n_chars == len(rows[i].text)
    assert bad.where(F.col("_corrupt").isNotNull()).collect() == []


def test_xml_corrupt_records_quarantined_not_fatal(spark, tmp_path):
    from erigon_extract_spark.sources.xmlfile import (
        read_documents_xml,
        split_quarantine,
    )

    p = tmp_path / "mixed.xml"
    p.write_text(
        "<docs>\n"
        '  <doc doc_id="1"><text>ok</text><lang>en</lang>'
        "<source>src0</source><n_chars>2</n_chars></doc>\n"
        # structural corruption: mismatched closing tag
        '  <doc doc_id="2"><text>bad structure</nope></doc>\n'
        # element-type corruption: non-numeric n_chars
        '  <doc doc_id="9"><text>x</text><lang>en</lang>'
        "<source>s</source><n_chars>abc</n_chars></doc>\n"
        # attribute-type corruption: Spark's PERMISSIVE mode does NOT
        # cover this (StaxXmlParser.convertAttributes throws through
        # FailureSafeParser) — the module's string+try_cast contract must
        # quarantine it instead of aborting the read
        '  <doc doc_id="not-a-number"><text>bad id</text><lang>en</lang>'
        "<source>s</source><n_chars>6</n_chars></doc>\n"
        '  <doc doc_id="3"><text>also ok</text><lang>fr</lang>'
        "<source>src1</source><n_chars>7</n_chars></doc>\n"
        # missing-attribute corruption: no doc_id at all parses "cleanly"
        # (null attribute, null _corrupt) — the contract must quarantine
        # the keyless row, not admit it with a null identity column
        "  <doc><text>keyless</text><lang>en</lang>"
        "<source>s</source><n_chars>7</n_chars></doc>\n"
        "</docs>\n"
    )
    clean, bad = split_quarantine(read_documents_xml(spark, str(p)))
    assert sorted(r.doc_id for r in clean.collect()) == [1, 3]
    # full-row collect: projecting only _corrupt trips SPARK-21610 (see
    # split_quarantine docstring in sources/jsonl.py)
    bad_rows = bad.collect()
    assert len(bad_rows) == 4
    assert any(
        r._corrupt == "bad doc_id attribute: not-a-number" for r in bad_rows
    )
    assert any(r._corrupt == "missing doc_id attribute" for r in bad_rows)


def test_xml_parallelism_is_per_file_not_per_split(spark, tmp_path):
    """Pin the measured Spark 4.1 behavior the module's sharding contract
    rests on: a single XML file NEVER splits (1 partition even when
    maxPartitionBytes would force ~20 splits — the multiLine-JSON failure
    mode), while N shard files plan N partitions. If a future Spark makes
    single files splittable, this fails and the module doc can relax."""
    from erigon_extract_spark.sources.xmlfile import read_documents_xml

    def rec(i):
        return (
            f'<doc doc_id="{i}"><text>text {i} padded {"x" * 50}</text>'
            f"<lang>en</lang><source>src0</source>"
            f"<n_chars>64</n_chars></doc>\n"
        )

    one = tmp_path / "one"
    one.mkdir()
    with open(one / "big.xml", "w") as f:
        f.write("<docs>\n")
        for i in range(20000):
            f.write(rec(i))
        f.write("</docs>\n")
    sharded = tmp_path / "sharded"
    sharded.mkdir()
    for s in range(4):
        with open(sharded / f"shard{s}.xml", "w") as f:
            f.write("<docs>\n")
            for i in range(s * 100, (s + 1) * 100):
                f.write(rec(i))
            f.write("</docs>\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        big = read_documents_xml(spark, str(one))
        assert big.rdd.getNumPartitions() == 1  # the pinned limitation
        assert big.count() == 20000
        shards = read_documents_xml(spark, str(sharded))
        assert shards.rdd.getNumPartitions() == 4  # parallelism = files
        assert shards.count() == 400
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_xml_write_read_roundtrip_values(spark, tmp_path):
    """Sink half: documents written as <docs><doc> archives read back
    value-identical — entities are re-escaped on write and re-decoded on
    read, so markup-bearing text survives the trip."""
    from erigon_extract_spark.sources.xmlfile import (
        ensure_sample,
        read_documents_xml,
        split_quarantine,
        write_documents_xml,
    )

    path = ensure_sample(tmp_path / "docs.xml")
    clean, _ = split_quarantine(read_documents_xml(spark, str(path)))
    out = tmp_path / "out_xml"
    write_documents_xml(clean, str(out))
    back, bad = split_quarantine(read_documents_xml(spark, str(out)))
    assert bad.collect() == []
    orig = {tuple(r) for r in clean.collect()}
    got = {tuple(r) for r in back.select(*clean.columns).collect()}
    assert got == orig


def test_xml_stream_available_now_matches_batch(spark, tmp_path):
    """Streaming XML ingest (file-drop pattern) over two landed shards
    equals the batch read of the same directory — schema, quarantine,
    and entity decoding behave identically in both engines."""
    import shutil
    import tempfile

    from erigon_extract_spark.sources.xmlfile import (
        ensure_sample,
        read_documents_xml,
        read_documents_xml_stream,
        split_quarantine,
    )

    d = tmp_path / "landing"
    d.mkdir()
    ensure_sample(d / "shard0.xml")
    (d / "shard1.xml").write_text(
        "<docs>\n"
        '  <doc doc_id="100"><text>late &amp; shard</text><lang>en</lang>'
        "<source>src9</source><n_chars>12</n_chars></doc>\n"
        '  <doc doc_id="oops"><text>broken</wrong></doc>\n'
        "</docs>\n"
    )
    clean_stream, _ = split_quarantine(
        read_documents_xml_stream(spark, str(d))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_xml_")
    try:
        q = (
            clean_stream.writeStream.format("memory")
            .queryName("xml_stream_t")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "availableNow stream timed out"
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    streamed = {r.doc_id for r in spark.table("xml_stream_t").collect()}
    clean_batch, bad_batch = split_quarantine(
        read_documents_xml(spark, str(d))
    )
    assert streamed == {r.doc_id for r in clean_batch.collect()}
    assert 100 in streamed and len(streamed) == 51
    assert len(bad_batch.collect()) == 1
