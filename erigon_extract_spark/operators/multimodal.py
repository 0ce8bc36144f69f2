"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode kernels, in order of reality: PNG (functions/png.py), WAV
(functions/wav.py) and animated GIF (functions/gif.py — full standard
LZW) all probe/decode NATIVELY with real pixels/samples — no media
libraries, runs in this container, exercised end-to-end through Spark in
tests; other formats use PIL behind an import guard; and
``fake_decode=True`` derives deterministic metadata from the bytes —
the mode the oracle-gated queries use, since a DuckDB oracle can mirror
a byte fold but not a deflate stream. Swapping kernels is the one
per-payload function; everything around it (null handling, lengths,
output assembly) is vectorized pandas.

Scale notes: binary payloads ride in Parquet as BYTE_ARRAY; keep
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads fits
executor memory, and push metadata-only predicates (mime, width) BEFORE
any decode so pruning happens on the cheap columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # the real-kernel branch: one import guard, one function swap
    from PIL import Image as _PILImage  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _PILImage = None
    _HAVE_PIL = False

MEDIA_META_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width int, height int, "
    "duration_ms long, decode_error string"
)


def _fake_probe(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real media probe: derive (width, height,
    duration_ms) from content bytes."""
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0x7FFFFFFF
    return 64 + h % 1920, 64 + (h >> 8) % 1080, (h >> 16) % 60_000


def _real_probe(payload: bytes) -> tuple[int, int, int]:
    """Real image probe: PNG/JPEG/GIF headers and WAV are parsed natively
    (pure numpy, functions/{png,jpeg,gif,wav}.py — no image library
    needed); other formats fall back to PIL. Raises when neither path
    applies so a misconfigured cluster fails loudly, not wrongly."""
    from erigon_extract_spark.functions.png import _SIGNATURE, probe_png
    from erigon_extract_spark.functions.wav import probe_wav

    if payload[:8] == _SIGNATURE:
        w, h, _c = probe_png(payload)
        return w, h, 0
    if payload[:2] == b"\xff\xd8":
        from erigon_extract_spark.functions.jpeg import probe_jpeg

        w, h, _c = probe_jpeg(payload)
        return w, h, 0
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        _rate, _ch, _bits, duration_ms = probe_wav(payload)
        return None, None, duration_ms
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from erigon_extract_spark.functions.gif import probe_gif

        w, h, _n, duration_ms = probe_gif(payload)
        return w, h, duration_ms
    if not _HAVE_PIL:
        raise NotImplementedError(
            "real probe of non-PNG/JPEG/WAV/GIF media requires PIL — not "
            "in this container (PNG, JPEG, WAV and GIF probe natively)"
        )
    import io

    with _PILImage.open(io.BytesIO(payload)) as im:
        return im.width, im.height, 0


def _content_digest(payload: bytes) -> int:
    h = 0
    for b in payload[:64]:
        h = (h * 131 + b) & 0x7FFFFFFF
    return h


def extract_media_metadata(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    mime_col: str = "mime",
    fake_decode: bool = True,
) -> DataFrame:
    """media(doc_id, mime, payload binary) → typed metadata table.

    One ``mapInPandas`` pass; the iterator contract keeps peak memory at one
    Arrow batch of payloads per task regardless of file size. The metadata
    path (ids, mime, null mask, byte lengths, error strings) is vectorized
    pandas; the ONLY per-payload Python is the probe itself — the
    irreducibly-binary kernel."""
    probe_fn = _fake_probe if fake_decode else _real_probe

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            n_bytes = payloads.str.len().fillna(0).astype("int64")
            rows = []
            for p in payloads:
                # per-payload quarantine: one malformed file lands in its
                # decode_error row, it must not fail the corpus-wide job
                if p is None:
                    rows.append((None, None, None, "null payload"))
                    continue
                try:
                    w, h, d = probe_fn(bytes(p))
                    rows.append((w, h, d, None))
                except Exception as exc:  # noqa: BLE001 — quarantine
                    rows.append(
                        (None, None, None, f"{type(exc).__name__}: {exc}")
                    )
            dims = pd.DataFrame(
                rows,
                columns=["width", "height", "duration_ms", "decode_error"],
                index=pdf.index,
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": pdf[mime_col],
                    "n_bytes": n_bytes,
                    "width": dims["width"],
                    "height": dims["height"],
                    "duration_ms": dims["duration_ms"],
                    "decode_error": dims["decode_error"],
                }
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
    feature-extraction shape every vision-training pipeline needs). With
    PIL present ``fake_decode=False`` resizes for real; the stub emits a
    deterministic payload (target-dims header + content digest of the
    source bytes) so schema, batching, and partitioning stay testable.

    Scale: payload-in/payload-out keeps one Arrow batch in flight per
    task — the same memory envelope as the probe regardless of file count.
    """

    header = target_w.to_bytes(4, "big") + target_h.to_bytes(4, "big")

    def _fake_resize(src: bytes) -> bytes:
        return header + _content_digest(src).to_bytes(4, "big")

    def _real_resize(src: bytes) -> bytes:
        # PNG/JPEG → native decode + vectorized bilinear + native
        # re-encode in the same format (pure numpy, functions/png.py and
        # functions/jpeg.py); other formats need PIL
        from erigon_extract_spark.functions.png import (
            _SIGNATURE,
            decode_png,
            encode_png,
            resize_bilinear,
        )

        if src[:8] == _SIGNATURE:
            return encode_png(
                resize_bilinear(decode_png(src), target_w, target_h)
            )
        if src[:2] == b"\xff\xd8":
            from erigon_extract_spark.functions.jpeg import (
                decode_jpeg,
                encode_jpeg,
            )

            return encode_jpeg(
                resize_bilinear(decode_jpeg(src), target_w, target_h)
            )
        if not _HAVE_PIL:
            raise NotImplementedError(
                "real resize of non-PNG/JPEG media requires PIL — not in "
                "this container (PNG and JPEG resize natively)"
            )
        import io

        with _PILImage.open(io.BytesIO(src)) as im:
            out = io.BytesIO()
            im.resize((target_w, target_h)).save(out, format=im.format or "PNG")
            return out.getvalue()

    resize_fn = _fake_resize if fake_decode else _real_resize

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            outs, errs = [], []
            for p in payloads:
                # per-payload quarantine, same contract as the probe: a
                # palette/16-bit/truncated image fills resize_error, not
                # the whole job's stack trace
                if p is None:
                    outs.append(None)
                    errs.append("null payload")
                    continue
                try:
                    outs.append(resize_fn(bytes(p)))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 — quarantine
                    outs.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "mime": pdf[mime_col],
                    "target_w": target_w,
                    "target_h": target_h,
                    "payload": pd.Series(outs, index=pdf.index, dtype=object),
                    "resize_error": pd.Series(
                        errs, index=pdf.index, dtype=object
                    ),
                }
            )

    return media.select(id_col, mime_col, payload_col).mapInPandas(
        kernel, schema=RESIZED_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, sample_rate int, n_channels int, bits int, "
    "duration_ms long, rms double, peak double, zcr_per_s double, "
    "silent boolean, decode_error string"
)


def extract_audio_features(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL audio kernel over WAV payloads (functions/wav.py — pure numpy
    RIFF/PCM parsing, no audio library): per-clip sample rate, duration,
    RMS/peak levels, zero-crossing rate and a silence flag — the cheap
    waveform-quality signals that gate a speech corpus (silent/clipped
    clip removal) before any model touches it.

    Same Arrow-batched ``mapInPandas`` envelope as the image kernels:
    one batch of payloads in flight per task; malformed clips land in
    ``decode_error`` rows instead of failing the job."""
    from erigon_extract_spark.functions.wav import probe_wav, wav_features

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((doc_id, None, None, None, None, None,
                                 None, None, None, "null payload"))
                    continue
                try:
                    b = bytes(payload)
                    rate, ch, bits, dur = probe_wav(b)
                    f = wav_features(b)
                    rows.append((doc_id, rate, ch, bits, dur, f["rms"],
                                 f["peak"], f["zcr_per_s"], f["silent"],
                                 None))
                except Exception as exc:  # noqa: BLE001 — per-clip quarantine
                    rows.append((doc_id, None, None, None, None, None,
                                 None, None, None,
                                 f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_channels", "bits",
                         "duration_ms", "rms", "peak", "zcr_per_s",
                         "silent", "decode_error"],
            )

    return media.select(id_col, payload_col).mapInPandas(
        kernel, schema=AUDIO_FEATURES_SCHEMA
    )


FRAMES_SCHEMA = (
    "doc_id long, frame_idx int, frame_ts_ms long, width int, height int, "
    "payload binary, decode_error string"
)


def extract_gif_frames(
    media: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL frame sampling from animated GIFs (functions/gif.py — full
    standard LZW decode, disposal/transparency composition): one output
    row per sampled timestamp, carrying the composed frame re-encoded as
    PNG (functions/png.py) — the video-to-image-training-examples stage,
    entirely stdlib+numpy. Sampling picks the frame visible at each
    ``every_ms`` tick of the animation timeline (frame_sample_plan's
    contract, now with actual pixels).

    Same Arrow-batched envelope and per-payload quarantine as the other
    media kernels; one malformed file fills decode_error, never fails
    the job."""
    from erigon_extract_spark.functions.gif import decode_gif
    from erigon_extract_spark.functions.png import encode_png

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((doc_id, None, None, None, None, None,
                                 "null payload"))
                    continue
                try:
                    w, h, frames = decode_gif(bytes(payload))
                    # visible-frame timeline: frame i covers
                    # [start_i, start_i + delay_i)
                    starts = []
                    t = 0
                    for delay_ms, _img in frames:
                        starts.append(t)
                        t += delay_ms
                    total = max(t, 1)
                    fi = 0
                    # one PNG encode per DISTINCT frame: consecutive ticks
                    # inside a long delay reuse the bytes (a 10s frame
                    # sampled at 250ms would otherwise deflate 40x)
                    png_cache: dict[int, bytearray] = {}
                    for k, ts in enumerate(range(0, total, every_ms)):
                        while (fi + 1 < len(frames)
                               and starts[fi + 1] <= ts):
                            fi += 1
                        if fi not in png_cache:
                            png_cache[fi] = bytearray(
                                encode_png(frames[fi][1])
                            )
                        rows.append(
                            (doc_id, k, ts, w, h, png_cache[fi], None)
                        )
                except Exception as exc:  # noqa: BLE001 — quarantine
                    rows.append((doc_id, None, None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_ts_ms", "width",
                         "height", "payload", "decode_error"],
            )

    return media.select(id_col, payload_col).mapInPandas(
        kernel, schema=FRAMES_SCHEMA
    )


def extract_video_frames(
    media: DataFrame,
    every_ms: int = 1000,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL frame sampling from MJPEG video in EITHER container —
    RIFF-AVI (functions/avi.py) or ISO-BMFF MP4 (functions/mp4.py),
    sniffed per payload from the leading bytes the way a production
    ingest must (the container is a property of each file, not of the
    column) — plus functions/jpeg.py baseline decode per frame: one
    output row per sampled timestamp, carrying the decoded frame
    re-encoded as PNG — the video-to-image-training-examples stage,
    sharing extract_gif_frames' output contract (FRAMES_SCHEMA) so
    downstream aHash/resize/near-dup operators compose unchanged.

    Timeline contract (the GIF path's, with fixed frame duration): AVI
    frame i is visible over [i*frame_ms, (i+1)*frame_ms); ticks run
    every ``every_ms`` over [0, n_frames*frame_ms); the emitted frame
    is the one visible at the tick. One JPEG decode + PNG encode per
    DISTINCT sampled frame (cached), not per tick.

    Same Arrow-batched mapInPandas envelope and per-payload quarantine
    as the other media kernels — one malformed container or frame fills
    decode_error, never fails the job. Scale shape: pure map stage,
    zero shuffles (the multimodal_png_scale 100x probe's plan family)."""
    from erigon_extract_spark.functions.avi import decode_avi_mjpeg
    from erigon_extract_spark.functions.jpeg import decode_jpeg
    from erigon_extract_spark.functions.mp4 import decode_mp4_mjpeg
    from erigon_extract_spark.functions.png import encode_png

    def _decode_container(data: bytes):
        if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
            return decode_avi_mjpeg(data)
        if data[4:8] == b"ftyp":
            return decode_mp4_mjpeg(data)
        raise ValueError("unrecognized video container")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    rows.append((doc_id, None, None, None, None, None,
                                 "null payload"))
                    continue
                try:
                    w, h, frame_us, frames = _decode_container(
                        bytes(payload)
                    )
                    frame_ms = max(frame_us // 1000, 1)
                    total = len(frames) * frame_ms
                    png_cache: dict[int, bytearray] = {}
                    for k, ts in enumerate(range(0, total, every_ms)):
                        fi = min(ts // frame_ms, len(frames) - 1)
                        if fi not in png_cache:
                            img = decode_jpeg(frames[fi])
                            png_cache[fi] = bytearray(encode_png(img))
                        rows.append(
                            (doc_id, k, ts, w, h, png_cache[fi], None)
                        )
                except Exception as exc:  # noqa: BLE001 — quarantine
                    rows.append((doc_id, None, None, None, None, None,
                                 f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "frame_ts_ms", "width",
                         "height", "payload", "decode_error"],
            )

    return media.select(id_col, payload_col).mapInPandas(
        kernel, schema=FRAMES_SCHEMA
    )


def ahash_from_png(
    images: DataFrame, id_col: str = "img_id", png_col: str = "png"
) -> DataFrame:
    """Perceptual average-hash over a binary PNG column: (img_id, b0..b3)
    where b0..b3 are the four 16-bit bands of the 64-bit aHash.

    The hash is INTEGER-EXACT by construction — bit i (for 8x8 block i
    of an 8x8 block grid) is ``block_sum * n_blocks > grand_sum``, a
    pure integer comparison with no float mean, no rounding mode, no
    engine dependence — which is what lets an image-dedup result sit
    under a cross-engine value hash (pHash's float DCT cannot).

    Decode runs in the Arrow-batched executor path through the real
    PNG codec (functions/png.py); multi-channel images hash their
    per-pixel channel SUM (integer luma stand-in — no float weights).
    Requires 64x64 images (the standard aHash preprocessing resize is
    the caller's step; resize_images/resize_bilinear compose here).
    """
    import pandas as pd

    id_out = id_col

    def work(batches):
        import numpy as np

        from erigon_extract_spark.functions.png import decode_png

        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[png_col]):
                a = decode_png(bytes(payload)).astype(np.int64).sum(axis=2)
                if a.shape != (64, 64):
                    raise ValueError(
                        f"ahash_from_png expects 64x64, got {a.shape}"
                    )
                total = int(a.sum())
                bs = a.reshape(8, 8, 8, 8).sum(axis=(1, 3)).reshape(-1)
                bits = (bs * 64 > total).astype(np.int64)
                bands = [
                    int(sum(int(bits[k * 16 + j]) << j for j in range(16)))
                    for k in range(4)
                ]
                rows.append((int(i), *bands))
            yield pd.DataFrame(
                rows, columns=[id_out, "b0", "b1", "b2", "b3"]
            )

    return images.mapInPandas(
        work,
        schema=f"{id_out} long, b0 long, b1 long, b2 long, b3 long",
    )


def ahash_near_pairs(
    bands: DataFrame, threshold: int = 3, id_col: str = "img_id"
) -> DataFrame:
    """(img_a, img_b, hamming) for every image pair whose 64-bit aHash
    is within ``threshold`` bits — image-level near-duplicate detection
    (the standard aHash dedup used on crawl image corpora).

    Candidates come from band blocking: hashes <= 3 bits apart must
    agree EXACTLY on at least one of the four 16-bit bands
    (pigeonhole), so the self-join runs per (band_idx, band_value)
    bucket — identical to the SimHash chunk-bucket scheme, never an
    all-pairs join. ``threshold`` must stay < 4 for that guarantee;
    raise the band count (not the threshold) for looser matching.
    """
    if not 0 <= threshold <= 3:
        raise ValueError(
            "threshold must be in [0, 3]: the 4-band pigeonhole "
            "guarantee breaks above bands-1 bits"
        )
    long = bands.select(
        F.col(id_col).alias("img"),
        F.expr(
            "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_idx, band_val)"
        ),
    )
    cand = (
        long.alias("a")
        .join(
            long.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.img") < F.col("b.img")),
        )
        .select(
            F.col("a.img").alias("img_a"), F.col("b.img").alias("img_b")
        )
        .distinct()
    )
    wa = bands.select(
        F.col(id_col).alias("img_a"),
        *[F.col(f"b{k}").alias(f"a{k}") for k in range(4)],
    )
    wb = bands.select(
        F.col(id_col).alias("img_b"),
        *[F.col(f"b{k}").alias(f"bb{k}") for k in range(4)],
    )
    ham = sum(
        F.bit_count(F.col(f"a{k}").bitwiseXOR(F.col(f"bb{k}")))
        for k in range(4)
    )
    return (
        cand.join(wa, "img_a")
        .join(wb, "img_b")
        .select(
            "img_a",
            "img_b",
            ham.cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= threshold)
    )
