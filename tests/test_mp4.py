"""MJPEG-in-MP4 (ISO-BMFF) container codec + mixed-container frame
sampling (functions/mp4.py; operators/multimodal.extract_video_frames
sniffs AVI vs MP4 per payload)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from erigon_extract_spark.functions.jpeg import decode_jpeg, encode_jpeg
from erigon_extract_spark.functions.mp4 import (
    Mp4FormatError,
    decode_mp4_mjpeg,
    encode_mp4_mjpeg,
)


def _dc_exact_frame(d: int, fi: int) -> np.ndarray:
    ty, tx = np.mgrid[0:4, 0:4]
    tiles = 128 + 2 * ((d * 13 + fi * 17 + ty * 5 + tx * 3) % 53 - 26)
    return np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1).astype("uint8")


def test_mp4_roundtrip_preserves_frames_and_timing():
    frames = [
        encode_jpeg(_dc_exact_frame(3, fi), quality=50) for fi in range(3)
    ]
    mp4 = encode_mp4_mjpeg(frames, width=32, height=32, fps=4)
    w, h, frame_us, back = decode_mp4_mjpeg(mp4)
    assert (w, h) == (32, 32)
    assert frame_us == 250_000
    assert back == frames  # byte-identical JPEG payloads
    for fi, payload in enumerate(back):
        got = decode_jpeg(payload)[:, :, 0]
        assert np.array_equal(got, _dc_exact_frame(3, fi))


def test_mp4_multi_chunk_stsc_resolution():
    """Other muxers split samples across chunks; the stsc->stco map must
    resolve them. Hand-build a 2-chunk layout: chunk 1 holds 2 samples,
    chunk 2 holds 1, with a gap byte between chunks."""
    frames = [b"\xff\xd8\x01\xd9", b"\xff\xd8\x02\x02\xd9", b"\xff\xd8\x03\xd9"]
    base = encode_mp4_mjpeg(frames, width=8, height=8, fps=10)
    # rebuild manually: ftyp | mdat(c1 + gap + c2) | moov with 2-entry stsc
    ftyp = base[: struct.unpack_from(">I", base, 0)[0]]
    c1 = frames[0] + frames[1]
    gap = b"\xee"
    c2 = frames[2]
    mdat = struct.pack(">I", 8 + len(c1) + len(gap) + len(c2)) + b"mdat" + c1 + gap + c2
    off1 = len(ftyp) + 8
    off2 = off1 + len(c1) + len(gap)
    moov_start = len(ftyp) + struct.unpack_from(">I", base, len(ftyp))[0]
    moov = base[moov_start:]
    # patch the single-run stsc (1,3,1) -> two runs (1,2,1),(2,1,1)
    old_stsc = struct.pack(">I", 8 + 4 + 4 + 12) + b"stsc" + struct.pack(
        ">IIIII", 0, 1, 1, 3, 1
    )
    new_stsc = struct.pack(">I", 8 + 4 + 4 + 24) + b"stsc" + struct.pack(
        ">IIIIIIII", 0, 2, 1, 2, 1, 2, 1, 1
    )
    assert old_stsc in moov
    moov = moov.replace(old_stsc, new_stsc)
    # patch stco: 1 chunk -> 2 chunks at the new offsets
    old_stco = struct.pack(">I", 8 + 4 + 4 + 4) + b"stco" + struct.pack(
        ">III", 0, 1, off1
    )
    new_stco = struct.pack(">I", 8 + 4 + 4 + 8) + b"stco" + struct.pack(
        ">IIII", 0, 2, off1, off2
    )
    assert old_stco in moov
    moov = moov.replace(old_stco, new_stco)
    # fix enclosing box sizes along the stbl/minf/mdia/trak/moov spine
    delta = (len(new_stsc) - len(old_stsc)) + (len(new_stco) - len(old_stco))
    out = bytearray(ftyp + mdat + moov)
    pos = len(ftyp) + len(mdat)
    for boxtype in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        idx = out.index(boxtype, pos)
        size = struct.unpack_from(">I", out, idx - 4)[0]
        struct.pack_into(">I", out, idx - 4, size + delta)
        pos = idx
    w, h, frame_us, back = decode_mp4_mjpeg(bytes(out))
    assert back == frames
    assert (w, h, frame_us) == (8, 8, 100_000)


def test_mp4_malformed_rejected():
    good = encode_mp4_mjpeg([b"\xff\xd8\xd9"], width=8, height=8, fps=10)
    with pytest.raises(Mp4FormatError):
        decode_mp4_mjpeg(b"not an mp4 at all, definitely")
    with pytest.raises(Mp4FormatError):  # truncated mid-moov
        decode_mp4_mjpeg(good[: len(good) - 30])
    with pytest.raises(Mp4FormatError):  # box overrunning the file
        bad = bytearray(good)
        struct.pack_into(">I", bad, 0, 1 << 30)
        decode_mp4_mjpeg(bytes(bad))
    with pytest.raises(Mp4FormatError):
        encode_mp4_mjpeg([], width=8, height=8, fps=10)
    with pytest.raises(Mp4FormatError):  # mdat-only: no moov
        decode_mp4_mjpeg(good[: struct.unpack_from(">I", good, 0)[0]])


def test_mp4_sample_count_cap():
    good = encode_mp4_mjpeg([b"\xff\xd8\xd9"] * 3, width=8, height=8, fps=10)
    with pytest.raises(Mp4FormatError):
        decode_mp4_mjpeg(good, max_frames=2)


def test_extract_video_frames_mixed_containers(spark):
    """One binary column carrying BOTH containers: the operator sniffs
    per payload; a junk payload quarantines without failing the job."""
    import pandas as pd

    from erigon_extract_spark.functions.avi import encode_avi_mjpeg
    from erigon_extract_spark.functions.png import decode_png
    from erigon_extract_spark.operators.multimodal import extract_video_frames

    frames = [
        encode_jpeg(_dc_exact_frame(5, fi), quality=50) for fi in range(3)
    ]
    rows = [
        (0, bytearray(encode_avi_mjpeg(frames, width=32, height=32, fps=4))),
        (1, bytearray(encode_mp4_mjpeg(frames, width=32, height=32, fps=4))),
        (2, bytearray(b"GARBAGE-NOT-A-CONTAINER")),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"]),
        schema="doc_id long, payload binary",
    )
    out = extract_video_frames(media, every_ms=250).collect()
    ok = [r for r in out if r.decode_error is None]
    bad = [r for r in out if r.decode_error is not None]
    assert len(ok) == 6 and {r.doc_id for r in ok} == {0, 1}
    assert len(bad) == 1 and bad[0].doc_id == 2
    # both containers must yield the SAME decoded pixels per frame_idx
    by_doc = {}
    for r in ok:
        by_doc.setdefault(r.doc_id, {})[r.frame_idx] = decode_png(
            bytes(r.payload)
        ).tobytes()
    assert by_doc[0] == by_doc[1]
