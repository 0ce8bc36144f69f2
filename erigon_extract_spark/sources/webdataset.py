"""WebDataset-style tar shards: the de-facto container format for
multimodal training corpora (image/audio payloads + sidecar metadata,
bundled as `key.ext` members in plain tar files, consumed sequentially
by dataloaders).

Plain tar is stdlib (`tarfile`), so both directions are real here:

- ``write_shards``: each Spark partition streams its rows into one
  ``shard-NNNNN.tar`` — no driver bottleneck, shard count = partition
  count, and a ``repartition(n)`` ahead of the write IS the shard-sizing
  knob. Members are written ``<key>.<ext>`` then ``<key>.json`` so a
  sequential reader sees payload and metadata adjacent (the WebDataset
  contract).
- ``read_shards``: Spark's ``binaryFile`` source lists and reads whole
  tars (tars are NOT byte-splittable — the shard is the parallelism
  unit, which is exactly why the format keeps shards at ~100 MB-1 GB);
  an Arrow-batched ``mapInPandas`` parses members per shard with
  ``tarfile`` over an in-memory buffer. At 100 TB the scan parallelism
  is #shards. Tar has no column projection — a metadata-only query
  still reads payload bytes; that is the format's documented trade
  (row bundles for sequential dataloader throughput), and why
  ``write_shards`` returns a columnar manifest so bookkeeping queries
  never touch the tars.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "shard string, n_samples long, n_bytes long"
SAMPLE_SCHEMA = (
    "shard string, key string, ext string, payload binary, meta string"
)


def write_shards(
    df: DataFrame,
    out_dir: str,
    *,
    key_col: str = "key",
    payload_col: str = "payload",
    ext_col: str = "ext",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """Write one ``shard-NNNNN.tar`` per partition of ``df`` under
    ``out_dir``; returns the shard manifest (shard, n_samples, n_bytes)
    as a DataFrame — the columnar sidecar a 100 TB corpus needs so
    bookkeeping queries never touch the tars.

    Rows with a NULL key or payload are skipped (a tar member cannot be
    null); count reconciliation against the manifest is the caller's
    dead-letter check. Keys must not contain '.' (the WebDataset member
    convention splits key from extension on the FIRST dot) — violating
    rows raise rather than silently corrupting reader-side pairing.
    One payload member per key: a duplicate key within a shard raises
    here, and ``read_shards`` raises on a second non-json member for
    the same stem — data is never silently shadowed on either side.

    Write protocol: each task writes shard-NNNNN.tar.<attempt>.tmp and
    atomically os.replace()s it into place on completion — a retried or
    speculative attempt never interleaves bytes with another attempt's
    file, and a reader never observes a truncated tar. (Re-evaluating
    the returned manifest DataFrame re-runs the write; collect it ONCE —
    it is the job's commit action.)"""
    meta_cols = meta_cols or []
    os.makedirs(out_dir, exist_ok=True)
    cols = [key_col, payload_col, ext_col, *meta_cols]

    def write_partition(batches):
        # one tar per partition; the partition id comes from the first
        # batch's TaskContext (stable within the task)
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = os.path.join(out_dir, f"shard-{pid:05d}.tar")
        tmp = f"{path}.{ctx.taskAttemptId()}.tmp"
        n = 0
        seen: set[str] = set()
        with tarfile.open(tmp, "w") as tar:
            for pdf in batches:
                for row in pdf.itertuples(index=False):
                    key = getattr(row, key_col)
                    payload = getattr(row, payload_col)
                    if key is None or payload is None:
                        continue
                    if "." in str(key):
                        raise ValueError(
                            f"webdataset key {key!r} contains '.' — the "
                            "member convention splits on the first dot"
                        )
                    skey = str(key)
                    if skey in seen:
                        raise ValueError(
                            f"duplicate webdataset key {key!r} in shard "
                            f"{pid} — one payload member per key"
                        )
                    seen.add(skey)
                    ext = getattr(row, ext_col) or "bin"
                    body = bytes(payload)
                    info = tarfile.TarInfo(name=f"{key}.{ext}")
                    info.size = len(body)
                    tar.addfile(info, io.BytesIO(body))
                    meta = {c: getattr(row, c) for c in meta_cols}
                    mbody = json.dumps(meta, sort_keys=True).encode()
                    minfo = tarfile.TarInfo(name=f"{key}.json")
                    minfo.size = len(mbody)
                    tar.addfile(minfo, io.BytesIO(mbody))
                    n += 1
        os.replace(tmp, path)  # atomic task commit
        yield pd.DataFrame(
            {
                "shard": [os.path.basename(path)],
                "n_samples": [n],
                "n_bytes": [os.path.getsize(path)],
            }
        )

    return df.select(*cols).mapInPandas(
        write_partition, schema=MANIFEST_SCHEMA
    )


def read_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read WebDataset tar shards back as one row per sample:
    (shard, key, ext, payload, meta-json). Parallelism = #shards (tars
    are the unit of work by design); member pairing follows the
    ``<key>.json`` sidecar convention."""
    tars = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar")
    )

    def parse(batches):
        for pdf in batches:
            out = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(fpath)
                samples: dict[str, dict] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for member in tar.getmembers():
                        if not member.isfile():
                            continue
                        # WebDataset convention: key = up to the FIRST
                        # dot (so 'k.tar.gz' pairs with 'k.json')
                        stem, _, ext = member.name.partition(".")
                        body = tar.extractfile(member).read()
                        entry = samples.setdefault(
                            stem, {"payload": None, "ext": None, "meta": None}
                        )
                        if ext == "json":
                            if entry["meta"] is not None:
                                raise ValueError(
                                    f"duplicate json sidecar for key "
                                    f"{stem!r} in {shard} — one sidecar "
                                    "per key"
                                )
                            entry["meta"] = body.decode()
                        else:
                            # Single-payload-per-key restriction (see
                            # write_shards): a second non-json member
                            # would silently shadow the first, so fail
                            # loudly instead of losing data.
                            if entry["payload"] is not None:
                                raise ValueError(
                                    f"duplicate payload members for key "
                                    f"{stem!r} in {shard}: .{entry['ext']} "
                                    f"and .{ext} (one payload per key)"
                                )
                            entry["payload"] = body
                            entry["ext"] = ext
                for key, entry in samples.items():
                    out.append(
                        (shard, key, entry["ext"], entry["payload"],
                         entry["meta"])
                    )
            yield pd.DataFrame(
                out, columns=["shard", "key", "ext", "payload", "meta"]
            )

    return tars.select("path", "content").mapInPandas(
        parse, schema=SAMPLE_SCHEMA
    )


def documents_to_shards(
    spark: SparkSession, docs: DataFrame, out_dir: str, n_shards: int = 4
) -> DataFrame:
    """Convenience: pack a documents table into text shards (one .txt
    member + json sidecar per doc), repartitioned to ``n_shards``."""
    prepared = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias(
            "payload"
        ),
        F.lit("txt").alias("ext"),
        F.col("lang"),
        F.col("source"),
    ).repartition(n_shards)
    return write_shards(
        prepared, out_dir, meta_cols=["lang", "source"]
    )
