"""WARC source: record framing, gzip twin, corruption resync, bomb caps."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_warc_plain_and_gzip_twins_identical(spark, tmp_path):
    """The per-record-gzip-member twin (the Common Crawl layout) parses
    byte-identical to the plain shard, and response payloads match the
    generating formula — including the CRLF-bearing every-7th bodies
    whose framing only Content-Length can get right."""
    from erigon_extract_spark.sources.warc import (
        _sample_body,
        ensure_sample,
        read_warc,
        split_quarantine,
    )

    plain_dir = tmp_path / "plain"
    gz_dir = tmp_path / "gz"
    plain_dir.mkdir()
    gz_dir.mkdir()
    ensure_sample(plain_dir / "sample.warc")
    ensure_sample(gz_dir / "sample.warc", gz=True)

    def rows(d):
        clean, bad = split_quarantine(read_warc(spark, str(d)))
        assert bad.collect() == []
        return sorted(
            (r.rec_idx, r.warc_type, r.target_uri, r.content_type,
             r.content_length, bytes(r.payload))
            for r in clean.collect()
        )

    got_plain = rows(plain_dir)
    got_gz = rows(gz_dir)
    assert [r[1:] for r in got_plain] == [r[1:] for r in got_gz]
    assert len(got_plain) == 61  # warcinfo + 30 request/response pairs
    resp = [r for r in got_plain if r[1] == "response"]
    assert len(resp) == 30
    for i, r in enumerate(resp):
        assert r[2] == f"https://example.org/page/{i}"
        assert r[5] == _sample_body(i)
        assert r[4] == len(_sample_body(i))


def test_warc_corruption_resyncs_per_record(spark, tmp_path):
    """One malformed record (bad header line) quarantines and the parser
    resyncs at the next WARC/1.0 magic — following records survive."""
    from erigon_extract_spark.sources.warc import (
        _record,
        read_warc,
        split_quarantine,
    )

    good = _record(
        [("WARC-Type", "response"), ("WARC-Target-URI", "https://a/1")],
        b"payload one",
    )
    bad = b"WARC/1.0\r\nNoColonHere\r\nContent-Length: 2\r\n\r\nok\r\n\r\n"
    good2 = _record(
        [("WARC-Type", "response"), ("WARC-Target-URI", "https://a/2")],
        b"payload two",
    )
    (tmp_path / "mixed.warc").write_bytes(good + bad + good2)
    clean, badf = split_quarantine(read_warc(spark, str(tmp_path)))
    uris = sorted(r.target_uri for r in clean.collect())
    assert uris == ["https://a/1", "https://a/2"]
    # exactly ONE quarantine row: the parser resyncs at the next
    # WARC/1.0 magic, so the bad record's orphaned body must NOT emit a
    # second "garbage before record" row
    bad_rows = badf.collect()
    assert len(bad_rows) == 1
    assert "malformed header" in bad_rows[0]._corrupt


def test_warc_one_bad_record_one_quarantine_row_pure():
    """Pure-parser twin across every quarantine-resync branch: bad
    header line, missing Content-Length, oversize Content-Length, and
    unterminated header block each cost exactly one quarantine row
    whether followed by another record (resync at its magic) or at the
    shard tail (stop, no trailing-bytes row)."""
    from erigon_extract_spark.sources.warc import (
        MAX_CONTENT_LENGTH,
        _record,
        parse_warc_records,
    )

    good = _record(
        [("WARC-Type", "response"), ("WARC-Target-URI", "https://a/g")],
        b"fine",
    )
    bads = [
        b"WARC/1.0\r\nNoColonHere\r\nContent-Length: 2\r\n\r\nok\r\n\r\n",
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\norphan body\r\n\r\n",
        b"WARC/1.0\r\nContent-Length: "
        + str(MAX_CONTENT_LENGTH + 1).encode()
        + b"\r\n\r\nbody\r\n\r\n",
        b"WARC/1.0\r\nWARC-Type: response\r\nno terminator",
    ]
    for bad in bads:
        # bad record in the middle: 2 clean + exactly 1 quarantine
        rows = list(parse_warc_records(good + bad + good))
        assert [r[7] is None for r in rows].count(True) == 2, bad
        assert len(rows) == 3, (bad, [r[7] for r in rows])
        # bad record at the tail: 1 clean + exactly 1 quarantine
        rows = list(parse_warc_records(good + bad))
        assert len(rows) == 2, (bad, [r[7] for r in rows])
        assert rows[0][7] is None and rows[1][7] is not None


def test_warc_truncated_payload_quarantined(spark, tmp_path):
    from erigon_extract_spark.sources.warc import (
        _record,
        read_warc,
        split_quarantine,
    )

    good = _record(
        [("WARC-Type", "response"), ("WARC-Target-URI", "https://a/1")],
        b"x" * 100,
    )
    (tmp_path / "cut.warc").write_bytes(good[:-60])  # cut mid-payload
    clean, bad = split_quarantine(read_warc(spark, str(tmp_path)))
    assert clean.collect() == []
    rows = bad.collect()
    assert len(rows) == 1 and "truncated payload" in rows[0]._corrupt


def test_warc_bomb_caps_quarantine_not_oom():
    """Pure-parser checks (no Spark): an absurd Content-Length and a
    truncated gzip member both quarantine instead of allocating."""
    import gzip

    from erigon_extract_spark.sources.warc import (
        MAX_CONTENT_LENGTH,
        _record,
        parse_warc_records,
    )

    huge = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        + f"Content-Length: {MAX_CONTENT_LENGTH + 1}\r\n\r\n".encode()
    )
    rows = list(parse_warc_records(huge, "f"))
    assert rows and rows[0][7] and "outside" in rows[0][7]

    ok = _record([("WARC-Type", "response")], b"fine")
    cut_gz = gzip.compress(ok, mtime=0)[:-4]
    rows = list(parse_warc_records(cut_gz, "f"))
    assert rows and rows[0][7] and "gzip" in rows[0][7]

    # decompression bomb: a ~100 KB member expanding to 100 MB must raise
    # at the cap DURING inflation (chunked decompress), not after a full
    # allocation — and the multi-member and roundtrip paths still work
    import pytest

    from erigon_extract_spark.sources.warc import _gunzip_members

    bomb = gzip.compress(b"\x00" * (100 << 20), mtime=0)
    assert len(bomb) < (1 << 20)  # high ratio, the attack premise
    with pytest.raises(ValueError, match="exceeds cap"):
        _gunzip_members(bomb, cap=1 << 20)
    two = gzip.compress(b"abc", mtime=0) + gzip.compress(b"def", mtime=0)
    assert _gunzip_members(two) == b"abcdef"


def test_warc_parallelism_is_per_shard(spark, tmp_path):
    """N shard files plan N tasks (binaryFile source) — the documented
    sharding contract."""
    from erigon_extract_spark.sources.warc import _record, read_warc

    for s in range(4):
        (tmp_path / f"shard{s}.warc").write_bytes(
            b"".join(
                _record(
                    [("WARC-Type", "response"),
                     ("WARC-Target-URI", f"https://a/{s}/{i}")],
                    f"body {s} {i}".encode(),
                )
                for i in range(10)
            )
        )
    df = read_warc(spark, str(tmp_path))
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 40
    assert df.filter(F.col("_corrupt").isNotNull()).count() == 0


def test_warc_parser_never_raises_property():
    """Robustness property (hypothesis): the record parser total-functions
    over ARBITRARY bytes — any input yields rows (possibly all
    quarantine), never an exception; and a valid record embedded after
    random garbage is still recovered via magic-resync."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from erigon_extract_spark.sources.warc import (
        _record,
        parse_warc_records,
    )

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=2048))
    def fuzz(data):
        rows = list(parse_warc_records(data, "f"))
        for r in rows:
            assert (r[7] is None) == (r[2] is not None or r[5] is not None)

    fuzz()

    good = _record(
        [("WARC-Type", "response"), ("WARC-Target-URI", "https://x/ok")],
        b"survivor",
    )

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=1, max_size=512))
    def resync(prefix):
        rows = list(parse_warc_records(prefix + good, "f"))
        recovered = [r for r in rows if r[7] is None and r[3] == "https://x/ok"]
        # the survivor must come back intact UNLESS the random prefix
        # itself ends with a WARC/1.0 header fragment that swallows it
        # (prefix containing the magic without a valid frame) — in that
        # case it must at least be accounted for as quarantine, never
        # silently dropped
        if b"WARC/1.0" not in prefix:
            assert len(recovered) == 1
            assert recovered[0][6] == b"survivor"
        assert rows, "input produced no rows at all"

    resync()


def test_warc_stream_available_now_matches_batch(spark, tmp_path):
    """Streaming WARC ingest over two landed shards (one gzipped, one
    with a corrupt record) equals the batch read: same clean set, same
    quarantine behavior through the stream."""
    import shutil
    import tempfile

    from erigon_extract_spark.sources.warc import (
        _record,
        ensure_sample,
        read_warc,
        read_warc_stream,
        split_quarantine,
    )

    d = tmp_path / "landing"
    d.mkdir()
    ensure_sample(d / "shard0.warc", gz=True)
    (d / "shard1.warc").write_bytes(
        _record(
            [("WARC-Type", "response"),
             ("WARC-Target-URI", "https://late/1")],
            b"late shard",
        )
        + b"WARC/1.0\r\nBrokenHeader\r\n\r\n"
    )
    clean_stream, _ = split_quarantine(read_warc_stream(spark, str(d)))
    ckpt = tempfile.mkdtemp(prefix="ckpt_warc_")
    try:
        q = (
            clean_stream.writeStream.format("memory")
            .queryName("warc_stream_t")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(600), "availableNow stream timed out"
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    streamed = {
        (r.target_uri, r.rec_idx)
        for r in spark.table("warc_stream_t").collect()
    }
    clean_batch, bad_batch = split_quarantine(read_warc(spark, str(d)))
    assert streamed == {
        (r.target_uri, r.rec_idx) for r in clean_batch.collect()
    }
    assert ("https://late/1", 0) in streamed
    assert len(streamed) == 62  # 61 fixture records + the late shard
    assert bad_batch.count() >= 1
