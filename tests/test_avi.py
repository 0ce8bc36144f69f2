"""MJPEG-in-AVI container codec + video frame sampling (the video
modality — functions/avi.py, operators/multimodal.extract_video_frames)."""

from __future__ import annotations

import numpy as np
import pytest

from erigon_extract_spark.functions.avi import (
    AviFormatError,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from erigon_extract_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _dc_exact_frame(d: int, fi: int) -> np.ndarray:
    """32x32 grayscale of 8x8-constant tiles with even offsets from 128 —
    quality-50 DC quantization is exact (see multimodal_jpeg_roundtrip)."""
    ty, tx = np.mgrid[0:4, 0:4]
    tiles = 128 + 2 * ((d * 7 + fi * 11 + ty * 5 + tx * 3) % 53 - 26)
    return np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1).astype("uint8")


def test_avi_roundtrip_preserves_frames_and_timing():
    frames = [
        encode_jpeg(_dc_exact_frame(3, fi), quality=50) for fi in range(3)
    ]
    avi = encode_avi_mjpeg(frames, width=32, height=32, fps=4)
    w, h, frame_us, back = decode_avi_mjpeg(avi)
    assert (w, h) == (32, 32)
    assert frame_us == 250_000
    assert back == frames  # byte-identical JPEG payloads
    # the contained JPEGs decode to the exact tile values (DC-exact)
    for fi, payload in enumerate(back):
        got = decode_jpeg(payload)[:, :, 0]
        assert np.array_equal(got, _dc_exact_frame(3, fi))


def test_avi_odd_sized_frames_word_aligned():
    # odd-length payloads force the RIFF pad byte path
    frames = [b"\xff\xd8" + bytes(j) + b"\xd9" for j in (1, 2, 3)]
    avi = encode_avi_mjpeg(frames, width=8, height=8, fps=10)
    _, _, _, back = decode_avi_mjpeg(avi)
    assert back == frames


def test_avi_malformed_rejected():
    with pytest.raises(AviFormatError):
        decode_avi_mjpeg(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(AviFormatError):
        decode_avi_mjpeg(b"not an avi at all")
    good = encode_avi_mjpeg([b"\xff\xd8\xd9"], width=8, height=8, fps=10)
    # truncating mid-movi must raise, not return garbage frames
    with pytest.raises(AviFormatError):
        decode_avi_mjpeg(good[: len(good) - 30] )
    with pytest.raises(AviFormatError):
        encode_avi_mjpeg([], width=8, height=8, fps=10)


def test_avi_frame_count_cap():
    frames = [b"x"] * 5
    avi = encode_avi_mjpeg(frames, width=8, height=8, fps=10)
    with pytest.raises(AviFormatError):
        decode_avi_mjpeg(avi, max_frames=4)


def test_extract_video_frames_timeline_and_quarantine(spark):
    import pandas as pd

    from erigon_extract_spark.functions.png import decode_png
    from erigon_extract_spark.operators.multimodal import (
        extract_video_frames,
    )

    def synth(batches):
        # NB: built inside the kernel — executor pickling cannot import
        # the test module, so the frame formula is restated locally
        from erigon_extract_spark.functions.avi import encode_avi_mjpeg
        from erigon_extract_spark.functions.jpeg import encode_jpeg

        def frame(d, fi):
            ty, tx = np.mgrid[0:4, 0:4]
            tiles = 128 + 2 * ((d * 7 + fi * 11 + ty * 5 + tx * 3) % 53 - 26)
            return np.repeat(
                np.repeat(tiles, 8, axis=0), 8, axis=1
            ).astype("uint8")

        for pdf in batches:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                if d == 2:
                    rows.append((d, bytearray(b"garbage")))
                    continue
                frames = [
                    encode_jpeg(frame(d, fi), quality=50)
                    for fi in range(3)
                ]
                rows.append((d, bytearray(
                    encode_avi_mjpeg(frames, width=32, height=32, fps=4)
                )))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    media = spark.range(3).mapInPandas(
        synth, schema="doc_id long, payload binary"
    )
    out = extract_video_frames(media, every_ms=250).collect()
    good = [r for r in out if r["decode_error"] is None]
    bad = [r for r in out if r["decode_error"] is not None]
    # 2 good docs x 3 frames at 250ms ticks over [0, 750)
    assert len(good) == 6 and len(bad) == 1
    assert bad[0]["doc_id"] == 2
    for r in good:
        assert (r["width"], r["height"]) == (32, 32)
        assert r["frame_ts_ms"] == r["frame_idx"] * 250
        img = decode_png(bytes(r["payload"]))[:, :, 0]
        assert np.array_equal(
            img, _dc_exact_frame(r["doc_id"], r["frame_idx"])
        )
