"""Minimal RIFF-AVI container codec for MJPEG video — the container
level of the video modality (SURVEY.md multimodal family; the C
reference has no media surface — capability parity with large-scale
training-data pipelines, like functions/{png,jpeg,gif,wav}.py).

MJPEG-in-AVI is the simplest real video format: each frame is a
complete baseline JPEG (functions/jpeg.py decodes it), and the RIFF
container contributes only structure — a ``hdrl`` header list (frame
timing, dimensions, stream descriptor) and a ``movi`` list of ``00dc``
frame chunks. Encoder and decoder implement exactly that subset:

- one video stream ('vids'/'MJPG'), no audio, no OpenDML extensions;
- frame timing from the main header's microseconds-per-frame (the
  stream header's dwScale/dwRate is written consistently but the
  decoder reads the one authoritative field);
- ``idx1`` is written for player compatibility and ignored on read
  (the movi walk IS the frame order).

Bomb-hardening (same discipline as the other codecs): every chunk size
is bounds-checked against the remaining buffer before use, the frame
count and per-frame size are capped, and a malformed structure raises
``AviFormatError`` — callers quarantine per payload, the job never
dies on one bad file.
"""

from __future__ import annotations

import struct


class AviFormatError(ValueError):
    pass


MAX_FRAMES = 100_000
MAX_FRAME_BYTES = 64 * 1024 * 1024


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd bodies get a pad byte that is
    # NOT counted in the stored size
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def encode_avi_mjpeg(
    frames: list[bytes], *, width: int, height: int, fps: int = 25
) -> bytes:
    """Wrap complete JPEG frame payloads into a playable MJPEG AVI."""
    if not frames:
        raise AviFormatError("no frames")
    if fps <= 0 or fps > 1_000_000:
        raise AviFormatError(f"bad fps {fps}")
    us_per_frame = 1_000_000 // fps
    max_len = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        us_per_frame,          # dwMicroSecPerFrame
        max_len * fps,         # dwMaxBytesPerSec (advisory)
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags: AVIF_HASINDEX
        len(frames),           # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_len,               # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,            # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,                 # dwFlags
            0, 0,              # wPriority, wLanguage
            0,                 # dwInitialFrames
            1,                 # dwScale
            fps,               # dwRate (fps = rate/scale)
            0,                 # dwStart
            len(frames),       # dwLength (frames)
            max_len,           # dwSuggestedBufferSize
            0xFFFFFFFF,        # dwQuality (default)
            0,                 # dwSampleSize (0 = variable)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                    # biSize
        width,
        height,
        1,                     # biPlanes
        24,                    # biBitCount
        b"MJPG",               # biCompression
        width * height * 3,    # biSizeImage (advisory)
        0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame — offset is relative to the 'movi'
    # fourcc position, per the original-AVI convention
    idx_entries = []
    off = 4  # the movi LIST body starts with its 'movi' fourcc
    for f in frames:
        idx_entries.append(
            b"00dc" + struct.pack("<III", 0x10, off, len(f))
        )
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each chunk in a span,
    bounds-checked."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        body_end = body_start + size
        if body_end > end:
            raise AviFormatError(
                f"chunk {fourcc!r} overruns container ({size} bytes)"
            )
        yield fourcc, body_start, body_end
        pos = body_end + (size % 2)


def decode_avi_mjpeg(
    data: bytes, *, max_frames: int = MAX_FRAMES
) -> tuple[int, int, int, list[bytes]]:
    """Parse an MJPEG AVI. Returns ``(width, height, frame_us,
    frames)`` — frame_us is microseconds per frame from the main
    header; frames are the raw JPEG payloads in movi order."""
    if len(data) < 24 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviFormatError("not a RIFF AVI")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    end = min(8 + riff_size, len(data))
    width = height = frame_us = None
    frames: list[bytes] = []
    for fourcc, bs, be in _walk(data, 12, end):
        if fourcc != b"LIST":
            continue
        list_type = data[bs : bs + 4]
        if list_type == b"hdrl":
            for sub, sbs, sbe in _walk(data, bs + 4, be):
                if sub == b"avih":
                    if sbe - sbs < 40:
                        raise AviFormatError("short avih")
                    vals = struct.unpack_from("<10I", data, sbs)
                    frame_us = vals[0]
                    width, height = vals[8], vals[9]
        elif list_type == b"movi":
            for sub, sbs, sbe in _walk(data, bs + 4, be):
                if sub in (b"00dc", b"00db"):
                    if sbe - sbs > MAX_FRAME_BYTES:
                        raise AviFormatError("frame exceeds byte cap")
                    if len(frames) >= max_frames:
                        raise AviFormatError("frame count exceeds cap")
                    frames.append(data[sbs:sbe])
    if width is None or frame_us is None:
        raise AviFormatError("missing avih header")
    if frame_us <= 0:
        raise AviFormatError(f"bad frame timing {frame_us}")
    if not frames:
        raise AviFormatError("no video frames")
    return width, height, frame_us, frames
