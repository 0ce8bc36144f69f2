"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (the container ships no
image/audio libraries): ``fake_decode=True`` derives deterministic metadata
from the bytes so the Spark-side contract — schema, batch iteration,
partition sizing — is real and tested; swapping in PIL/ffmpeg later only
changes the inner function.

Scale notes: binary payloads ride in Parquet as BYTE_ARRAY; keep
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads fits
executor memory, and push metadata-only predicates (mime, width) BEFORE
any decode so pruning happens on the cheap columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width int, height int, "
    "duration_ms long, decode_error string"
)


def _fake_probe(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real media probe: derive (width, height,
    duration_ms) from content bytes. Replaced by PIL/ffprobe in production."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0x7FFFFFFF
    return 64 + h % 1920, 64 + (h >> 8) % 1080, (h >> 16) % 60_000


def extract_media_metadata(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    mime_col: str = "mime",
    fake_decode: bool = True,
) -> DataFrame:
    """media(doc_id, mime, payload binary) → typed metadata table.

    One ``mapInPandas`` pass; the iterator contract keeps peak memory at one
    Arrow batch of payloads per task regardless of file size.
    """

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[payload_col]
                if payload is None:
                    rows.append((r[id_col], r[mime_col], 0, None, None, None,
                                 "null payload"))
                    continue
                if not fake_decode:
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg — not in container"
                    )
                w, h, d = _fake_probe(bytes(payload))
                rows.append(
                    (r[id_col], r[mime_col], len(payload), w, h, d, None)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "mime", "n_bytes", "width", "height",
                    "duration_ms", "decode_error",
                ],
            )

    cols = [id_col, mime_col, payload_col]
    return media.select(*cols).mapInPandas(probe, schema=MEDIA_META_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Plan frame-sampling work items: one row per (doc, frame_ts). The
    actual frame extraction is the same stubbed decode contract; the
    exploded plan shows the partitioning shape (work items distribute
    independently of source file boundaries)."""
    from pyspark.sql import functions as F

    meta = extract_media_metadata(media, payload_col=payload_col, id_col=id_col)
    return meta.filter(F.col("duration_ms") > 0).select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


RESIZED_SCHEMA = (
    "doc_id long, mime string, target_w int, target_h int, payload binary, "
    "resize_error string"
)


def resize_images(
    media: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    mime_col: str = "mime",
    fake_decode: bool = True,
) -> DataFrame:
    """Image resize as an Arrow-batched ``mapInPandas`` stage (the
    feature-extraction shape every vision-training pipeline needs). The
    pixel kernel is STUBBED like the probe: ``fake_decode`` emits a
    deterministic payload (target-dims header + content digest of the
    source bytes) so schema, batching, and partitioning are testable;
    swapping in PIL changes only the inner function.

    Scale: payload-in/payload-out keeps one Arrow batch in flight per
    task — the same memory envelope as the probe regardless of file count.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = r[payload_col]
                if payload is None:
                    rows.append((r[id_col], r[mime_col], target_w, target_h,
                                 None, "null payload"))
                    continue
                if not fake_decode:
                    raise NotImplementedError(
                        "real resize requires PIL — not in container"
                    )
                src = bytes(payload)
                digest = 0
                for b in src[:64]:
                    digest = (digest * 131 + b) & 0x7FFFFFFF
                fake = (
                    target_w.to_bytes(4, "big")
                    + target_h.to_bytes(4, "big")
                    + digest.to_bytes(4, "big")
                )
                rows.append((r[id_col], r[mime_col], target_w, target_h,
                             fake, None))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "mime", "target_w", "target_h", "payload",
                         "resize_error"],
            )

    return media.select(id_col, mime_col, payload_col).mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )
