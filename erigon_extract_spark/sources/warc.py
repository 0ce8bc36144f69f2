"""WARC source — the web-crawl archive format (ISO 28500; what Common
Crawl ships). The crawl family parses URLs/robots/sitemaps already; this
is the file-level ingest for the archives a crawler actually lands.

Design rules (the same 100 TB lessons as the CSV/JSONL/XML sources,
plus WARC-specific ones):

- **Per-file parallelism, record-level parsing in Arrow batches.** A
  WARC shard is read whole via Spark's ``binaryFile`` source and parsed
  inside ``mapInPandas`` — one task per shard, exactly how Common Crawl
  is consumed (it ships ~1 GB shards for this reason). Record-level
  splitting of one giant file would need the per-record-gzip-member
  byte-range trick; out of scope — shard your archives.
- **Resync on corruption.** A malformed record (bad header block,
  truncated payload, missing version line) becomes ONE quarantine row
  and the parser rescans for the next ``WARC/1.0`` magic — a producer
  bug costs one record, not the shard's tail.
- **Bomb-hardened.** Caps on header block size, per-record content
  length, records per shard, and total decompressed bytes; a cap hit
  quarantines (or truncates the record stream loudly), never OOMs the
  executor.
- **Gzip by sniff, multi-member safe.** A ``.warc.gz`` shard is one
  gzip member per record (the standard layout); Python's zlib loop
  decompresses concatenated members under the same total-bytes cap.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

WARC_FIELDS = (
    "path string, rec_idx int, warc_type string, target_uri string, "
    "content_type string, content_length long, payload binary, "
    "_corrupt string"
)

# bomb guards — generous for real archives, fatal for crafted ones
MAX_HEADER_BLOCK = 64 * 1024
MAX_CONTENT_LENGTH = 256 * 1024 * 1024
MAX_RECORDS_PER_SHARD = 2_000_000
MAX_DECOMPRESSED_BYTES = 8 * 1024 * 1024 * 1024

_MAGIC = b"WARC/1.0"


def _gunzip_members(data: bytes, cap: int = MAX_DECOMPRESSED_BYTES) -> bytes:
    """Decompress concatenated gzip members with a total-size cap.

    Chunked (1 MB per decompress call) so the cap is enforced DURING
    inflation — a 1 KB member claiming to expand to 10 GB (the classic
    decompression bomb) raises after ~cap bytes, never after a full
    allocation. Pytest-pinned with a crafted high-ratio member.
    """
    out = []
    total = 0
    view = data
    while view:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        buf = view
        while not d.eof:
            chunk = d.decompress(buf, 1 << 20)
            if chunk:
                total += len(chunk)
                if total > cap:
                    raise ValueError(
                        f"decompressed size exceeds cap {cap}"
                    )
                out.append(chunk)
            buf = d.unconsumed_tail
            if not d.eof and not buf and not chunk:  # input exhausted
                raise ValueError("truncated gzip member")
        view = d.unused_data
    return b"".join(out)


def parse_warc_records(data: bytes, path: str = "") -> Iterator[tuple]:
    """Yield rows matching WARC_FIELDS from one shard's bytes.

    Pure function of the bytes (independently testable, no Spark).
    Corruption yields a quarantine row and resyncs at the next magic.
    """
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gunzip_members(data)
        except Exception as e:  # noqa: BLE001 — whole shard unreadable
            yield (path, 0, None, None, None, None, None,
                   f"gzip: {e}")
            return
    pos = 0
    idx = 0
    n = len(data)
    while pos < n and idx < MAX_RECORDS_PER_SHARD:
        start = data.find(_MAGIC, pos)
        if start < 0:
            if data[pos:].strip():
                yield (path, idx, None, None, None, None, None,
                       "no WARC/1.0 magic in trailing "
                       f"{n - pos} bytes")
                idx += 1
            return
        if start > pos and data[pos:start].strip():
            yield (path, idx, None, None, None, None, None,
                   f"garbage before record at byte {start}")
            idx += 1
        # Resync point for every quarantined record: the NEXT magic
        # after this one. Resuming at hdr_end+4 instead would leave the
        # orphaned body in the stream, where it triggers a second
        # "garbage before record" quarantine row — one producer bug must
        # cost exactly one quarantine row, not two. (-1 = no further
        # record: stop after yielding, emitting no trailing-bytes row
        # for the same reason.)
        resync = data.find(_MAGIC, start + len(_MAGIC))
        hdr_end = data.find(b"\r\n\r\n", start, start + MAX_HEADER_BLOCK)
        if hdr_end < 0:
            yield (path, idx, None, None, None, None, None,
                   "unterminated header block (cap "
                   f"{MAX_HEADER_BLOCK})")
            idx += 1
            if resync < 0:
                return
            pos = resync
            continue
        headers = {}
        bad_header = None
        for line in data[start + len(_MAGIC): hdr_end].split(b"\r\n"):
            if not line:
                continue
            k, sep, v = line.partition(b":")
            if not sep:
                bad_header = line[:80]
                break
            headers[k.strip().lower()] = v.strip()
        if bad_header is not None:
            yield (path, idx, None, None, None, None, None,
                   f"malformed header line: {bad_header!r}")
            idx += 1
            if resync < 0:
                return
            pos = resync
            continue
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            yield (path, idx, None, None, None, None, None,
                   "missing or non-integer Content-Length")
            idx += 1
            if resync < 0:
                return
            pos = resync
            continue
        if not 0 <= length <= MAX_CONTENT_LENGTH:
            yield (path, idx, None, None, None, None, None,
                   f"Content-Length {length} outside [0, "
                   f"{MAX_CONTENT_LENGTH}]")
            idx += 1
            if resync < 0:
                return
            pos = resync
            continue
        body_start = hdr_end + 4
        body_end = body_start + length
        if body_end > n:
            yield (path, idx, None, None, None, None, None,
                   f"truncated payload: need {length} bytes, "
                   f"have {n - body_start}")
            idx += 1
            return
        yield (
            path,
            idx,
            headers.get(b"warc-type", b"").decode("ascii", "replace")
            or None,
            headers.get(b"warc-target-uri", b"").decode("ascii", "replace")
            or None,
            headers.get(b"content-type", b"").decode("ascii", "replace")
            or None,
            length,
            bytes(data[body_start:body_end]),
            None,
        )
        idx += 1
        pos = body_end
        # the spec's two CRLF record separators — tolerate their absence
        while data[pos:pos + 2] == b"\r\n":
            pos += 2


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC shard(s) into records. One task per shard file
    (``binaryFile`` source), parsing in Arrow batches; malformed records
    surface as ``_corrupt`` rows per the module rules."""
    import pandas as pd

    def gen(batches):
        cols = ["path", "rec_idx", "warc_type", "target_uri",
                "content_type", "content_length", "payload", "_corrupt"]
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_records(bytes(content), str(p)))
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
        .mapInPandas(gen, schema=WARC_FIELDS)
    )


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of :func:`read_warc` — the crawler file-drop
    pattern: shards land in a directory, Structured Streaming picks each
    up exactly once, and the SAME Arrow-batched parser runs per shard
    (mapInPandas is stateless, so batch/stream parity is structural;
    pinned by an availableNow == batch pytest)."""
    import pandas as pd

    def gen(batches):
        cols = ["path", "rec_idx", "warc_type", "target_uri",
                "content_type", "content_length", "payload", "_corrupt"]
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_records(bytes(content), str(p)))
            yield pd.DataFrame(rows, columns=cols)

    return (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
        .mapInPandas(gen, schema=WARC_FIELDS)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean records without the quarantine column, corrupt rows)."""
    from pyspark.sql import functions as F

    clean = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = df.filter(F.col("_corrupt").isNotNull())
    return clean, bad


# ---------------------------------------------------------------------------
# Committed deterministic fixture: a warcinfo record, then request/response
# pairs whose bodies are a pure function of the index — the oracle
# reconstructs the response rows from the same formula (DuckDB reads no
# WARC). Every 7th response body embeds CRLF pairs so payload framing is
# exercised by Content-Length, not by separator scanning.
# ---------------------------------------------------------------------------

SAMPLE_PATH = (
    Path(__file__).resolve().parent.parent.parent
    / "fixtures_warc"
    / "sample.warc"
)


def _sample_body(i: int) -> bytes:
    text = f"<html><body>doc {i} & tail {i * i}</body></html>"
    if i % 7 == 0:
        text = f"line one {i}\r\nline two {i}\r\n" + text
    return text.encode("ascii")


def _record(headers: list[tuple[str, str]], body: bytes) -> bytes:
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}\r\n".encode("ascii") for k, v in headers
    )
    return head + f"Content-Length: {len(body)}\r\n\r\n".encode() + body + b"\r\n\r\n"


def ensure_sample(path: Path = SAMPLE_PATH, gz: bool = False) -> Path:
    """Write the deterministic WARC sample if missing: 1 warcinfo + 30
    request/response pairs (bodies per ``_sample_body``). ``gz=True``
    writes the per-record-gzip-member twin next to it."""
    import gzip

    if gz:
        path = path.with_suffix(".warc.gz")
    if path.exists():
        return path
    recs = [_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Record-ID", "<urn:uuid:00000000-0000-0000-0000-000000000000>"),
         ("Content-Type", "application/warc-fields")],
        b"software: spark-graft-fixture/1.0\r\n",
    )]
    for i in range(30):
        uri = f"https://example.org/page/{i}"
        recs.append(_record(
            [("WARC-Type", "request"),
             ("WARC-Target-URI", uri),
             ("Content-Type", "application/http;msgtype=request")],
            f"GET /page/{i} HTTP/1.1\r\nHost: example.org\r\n\r\n".encode(),
        ))
        recs.append(_record(
            [("WARC-Type", "response"),
             ("WARC-Target-URI", uri),
             ("Content-Type", "text/html")],
            _sample_body(i),
        ))
    path.parent.mkdir(parents=True, exist_ok=True)
    if gz:
        with open(path, "wb") as f:
            for r in recs:  # one gzip member per record — the CC layout
                f.write(gzip.compress(r, mtime=0))
    else:
        path.write_bytes(b"".join(recs))
    return path
