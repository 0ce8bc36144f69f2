"""Minimal ISO-BMFF (MP4) container codec for MJPEG video — the second
container of the video modality, beside functions/avi.py (SURVEY.md
multimodal family; the C reference has no media surface — capability
parity with large-scale training-data pipelines).

MJPEG-in-MP4 keeps the frame payloads as complete baseline JPEGs
(functions/jpeg.py decodes them); the container contributes the box
tree: ``ftyp`` + ``mdat`` (the concatenated samples) + ``moov`` with
one video ``trak`` whose sample tables (``stsd``/``stts``/``stsc``/
``stsz``/``stco``) locate and time every frame. Encoder and decoder
implement exactly that subset:

- one video track, ``jpeg`` sample entry, no audio, no edit lists,
  no fragmentation (``moof``) — the classic progressive-download
  layout with ``mdat`` before ``moov`` so chunk offsets need no fixup;
- media timescale 1,000,000 with one stts run, so the per-frame
  duration IS microseconds and round-trips the AVI path's
  ``us_per_frame`` exactly;
- the full stsc→stco sample-to-chunk mapping on read (multi-chunk
  files from other muxers resolve correctly), plus ``co64``.

Bomb-hardening (same discipline as the other codecs): every box size
is bounds-checked before use (including 64-bit ``largesize`` and the
size-0 "to end of file" form), sample counts/sizes/table lengths are
capped, and malformed structure raises ``Mp4FormatError`` — callers
quarantine per payload, the job never dies on one bad file.
"""

from __future__ import annotations

import struct


class Mp4FormatError(ValueError):
    pass


MAX_FRAMES = 100_000
MAX_FRAME_BYTES = 64 * 1024 * 1024
MAX_TABLE_ENTRIES = 1_000_000
MEDIA_TIMESCALE = 1_000_000  # microseconds — matches AVI's us_per_frame


def _box(boxtype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + boxtype + body


def _full(boxtype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(boxtype, struct.pack(">I", (version << 24) | flags) + body)


_UNITY_MATRIX = struct.pack(
    ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def encode_mp4_mjpeg(
    frames: list[bytes], *, width: int, height: int, fps: int = 25
) -> bytes:
    """Wrap complete JPEG frame payloads into a playable MJPEG MP4."""
    if not frames:
        raise Mp4FormatError("no frames")
    if fps <= 0 or fps > 1_000_000:
        raise Mp4FormatError(f"bad fps {fps}")
    if len(frames) > MAX_FRAMES:
        raise Mp4FormatError("frame count exceeds cap")
    us_per_frame = MEDIA_TIMESCALE // fps
    n = len(frames)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(frames))
    # progressive layout: mdat precedes moov, so the single chunk's
    # absolute offset is known before the sample tables are built
    chunk_offset = len(ftyp) + 8

    entry = (
        b"\x00" * 6  # reserved
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved (VisualSampleEntry)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4  # reserved
        + struct.pack(">H", 1)  # frame_count
        + b"\x05MJPEG" + b"\x00" * 26  # compressorname (pascal, 32 B)
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, us_per_frame))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(
            struct.pack(">I", len(f)) for f in frames
        ),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    dref = _full(
        b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")
    )
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
        + _box(b"dinf", dref)
        + stbl,
    )
    duration = n * us_per_frame
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, MEDIA_TIMESCALE, duration, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"MJPEG\x00",
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    movie_duration = duration * 1000 // MEDIA_TIMESCALE  # mvhd timescale
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIIII", 0, 0, 1, 0, movie_duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + _UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, movie_duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _UNITY_MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(data: bytes, start: int, end: int):
    """Yield (boxtype, body_start, body_end) for each box in a span,
    bounds-checked; handles largesize (size==1) and to-end (size==0)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        boxtype = data[pos + 4 : pos + 8]
        if size == 0:  # box extends to the end of the enclosing span
            body_start, body_end = pos + 8, end
        elif size == 1:
            if pos + 16 > end:
                raise Mp4FormatError("truncated largesize box")
            (large,) = struct.unpack_from(">Q", data, pos + 8)
            if large < 16:
                raise Mp4FormatError(f"bad largesize {large}")
            body_start, body_end = pos + 16, pos + large
        elif size < 8:
            raise Mp4FormatError(f"bad box size {size}")
        else:
            body_start, body_end = pos + 8, pos + size
        if body_end > end:
            raise Mp4FormatError(
                f"box {boxtype!r} overruns container "
                f"({body_end - pos} bytes)"
            )
        yield boxtype, body_start, body_end
        if body_end <= pos:  # size-0 at span end cannot loop
            break
        pos = body_end


def _find(data: bytes, start: int, end: int, boxtype: bytes):
    for t, bs, be in _walk(data, start, end):
        if t == boxtype:
            return bs, be
    return None


def _u32s(data: bytes, pos: int, n: int) -> tuple:
    return struct.unpack_from(f">{n}I", data, pos)


def _table(data: bytes, bs: int, be: int, per_entry: int) -> tuple[int, int]:
    """Validate a full-box table header: returns (entry_count, body pos)."""
    if be - bs < 8:
        raise Mp4FormatError("short table box")
    (count,) = _u32s(data, bs + 4, 1)
    if count > MAX_TABLE_ENTRIES:
        raise Mp4FormatError(f"table entry count {count} exceeds cap")
    if bs + 8 + count * per_entry > be:
        raise Mp4FormatError("table overruns box")
    return count, bs + 8


def decode_mp4_mjpeg(
    data: bytes, *, max_frames: int = MAX_FRAMES
) -> tuple[int, int, int, list[bytes]]:
    """Parse an MJPEG MP4. Returns ``(width, height, frame_us, frames)``
    — the same contract as functions/avi.decode_avi_mjpeg, so the
    multimodal operator treats the two containers interchangeably."""
    if len(data) < 16:
        raise Mp4FormatError("not an ISO-BMFF file")
    head = _find(data, 0, len(data), b"ftyp")
    if head is None or data[4:8] != b"ftyp":
        raise Mp4FormatError("missing leading ftyp")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise Mp4FormatError("missing moov")

    for t, bs, be in _walk(data, *moov):
        if t != b"trak":
            continue
        mdia = _find(data, bs, be, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(data, *mdia, b"hdlr")
        if hdlr is None or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        minf = _find(data, *mdia, b"minf")
        if mdhd is None or minf is None:
            raise Mp4FormatError("video trak missing mdhd/minf")
        if mdhd[1] - mdhd[0] < 20:
            raise Mp4FormatError("short mdhd")
        version = data[mdhd[0]]
        if version == 1:  # 64-bit times: timescale sits after two u64s
            (timescale,) = _u32s(data, mdhd[0] + 20, 1)
        else:
            (timescale,) = _u32s(data, mdhd[0] + 12, 1)
        if timescale <= 0:
            raise Mp4FormatError("bad media timescale")
        stbl = _find(data, *minf, b"stbl")
        if stbl is None:
            raise Mp4FormatError("video trak missing stbl")
        return _decode_stbl(data, stbl, timescale, max_frames)
    raise Mp4FormatError("no video track")


def _decode_stbl(
    data: bytes, stbl: tuple[int, int], timescale: int, max_frames: int
) -> tuple[int, int, int, list[bytes]]:
    stsd = _find(data, *stbl, b"stsd")
    if stsd is None or stsd[1] - stsd[0] < 16:
        raise Mp4FormatError("missing stsd")
    entry_type = data[stsd[0] + 12 : stsd[0] + 16]
    if entry_type not in (b"jpeg", b"mjpa", b"mjpb"):
        raise Mp4FormatError(f"unsupported codec {entry_type!r}")
    entry_body = stsd[0] + 16
    if entry_body + 36 > stsd[1]:
        raise Mp4FormatError("short sample entry")
    width, height = struct.unpack_from(">HH", data, entry_body + 24)

    stts = _find(data, *stbl, b"stts")
    if stts is None:
        raise Mp4FormatError("missing stts")
    n_runs, pos = _table(data, *stts, 8)
    if n_runs < 1:
        raise Mp4FormatError("empty stts")
    # one authoritative frame duration, the AVI reader's contract: take
    # the first run's delta (variable-rate files are out of subset scope
    # but still decode — their later deltas are ignored for timing)
    _, delta = _u32s(data, pos, 2)
    if delta <= 0:
        raise Mp4FormatError(f"bad sample delta {delta}")
    frame_us = delta * 1_000_000 // timescale
    if frame_us <= 0:
        raise Mp4FormatError("sub-microsecond frame timing")

    stsz = _find(data, *stbl, b"stsz")
    if stsz is None or stsz[1] - stsz[0] < 12:
        raise Mp4FormatError("missing stsz")
    fixed_size, n_samples = _u32s(data, stsz[0] + 4, 2)
    if n_samples > max_frames or n_samples > MAX_FRAMES:
        raise Mp4FormatError("frame count exceeds cap")
    if n_samples == 0:
        raise Mp4FormatError("no video frames")
    if fixed_size:
        sizes = [fixed_size] * n_samples
    else:
        if stsz[0] + 12 + 4 * n_samples > stsz[1]:
            raise Mp4FormatError("stsz overruns box")
        sizes = list(_u32s(data, stsz[0] + 12, n_samples))
    if any(s > MAX_FRAME_BYTES for s in sizes):
        raise Mp4FormatError("frame exceeds byte cap")

    stsc = _find(data, *stbl, b"stsc")
    if stsc is None:
        raise Mp4FormatError("missing stsc")
    n_stsc, pos = _table(data, *stsc, 12)
    runs = [_u32s(data, pos + 12 * i, 3) for i in range(n_stsc)]

    stco = _find(data, *stbl, b"stco")
    if stco is not None:
        n_chunks, pos = _table(data, *stco, 4)
        offsets = [_u32s(data, pos + 4 * i, 1)[0] for i in range(n_chunks)]
    else:
        co64 = _find(data, *stbl, b"co64")
        if co64 is None:
            raise Mp4FormatError("missing stco/co64")
        n_chunks, pos = _table(data, *co64, 8)
        offsets = [
            struct.unpack_from(">Q", data, pos + 8 * i)[0]
            for i in range(n_chunks)
        ]

    # resolve stsc runs: samples-per-chunk for chunk c is the last run
    # whose first_chunk <= c+1; samples lie consecutively in each chunk
    frames: list[bytes] = []
    sample = 0
    for ci in range(n_chunks):
        spc = 0
        for first_chunk, samples_per_chunk, _desc in runs:
            if first_chunk <= ci + 1:
                spc = samples_per_chunk
            else:
                break
        off = offsets[ci]
        for _ in range(spc):
            if sample >= n_samples:
                break
            size = sizes[sample]
            if off + size > len(data):
                raise Mp4FormatError("sample overruns file")
            frames.append(data[off : off + size])
            off += size
            sample += 1
    if sample != n_samples:
        raise Mp4FormatError(
            f"chunk map yields {sample} samples, stsz declares {n_samples}"
        )
    return width, height, frame_us, frames
