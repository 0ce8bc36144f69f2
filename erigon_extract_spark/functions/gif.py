"""Pure numpy GIF decoding — REAL animated-frame extraction for
containers without PIL/ffmpeg.

GIF is the one animation container that is stdlib-feasible: block-framed
chunks, palettes, and LZW-compressed index streams (GIF89a spec). The
decoder implements the full standard LZW (variable code width to 12 bits,
clear/EOI, the code==next self-reference case) and composes frames with
disposal methods 0/1 (leave) and 2 (restore background); disposal 3
(restore previous) and interlaced images raise ``GifFormatError`` loudly.

The encoder exists for tests and round trips: it emits literal codes with
a CLEAR before the dictionary could ever grow (the classic
"uncompressed GIF" construction — larger output, correctness by
construction, decodable by any conformant reader).

Frames come back as (delay_ms, (H, W, 3) uint8) tuples; ``probe_gif``
walks block headers only (no LZW work) for metadata passes.
"""

from __future__ import annotations

import struct

import numpy as np


class GifFormatError(ValueError):
    """Unsupported or malformed GIF."""


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifFormatError("truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out.extend(data[pos:pos + n])
        if len(data) < pos + n:
            raise GifFormatError("truncated sub-block body")
        pos += n


def _skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise GifFormatError("truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def lzw_decode(
    data: bytes, min_code_size: int, max_out: int | None = None
) -> list[int]:
    """Standard GIF LZW: variable-width codes LSB-first, dictionary to
    4096 entries (hard spec cap — entries past it are never added, so a
    crafted stream cannot grow entry tuples unboundedly), clear/EOI
    codes, the code==next self-reference case. ``max_out`` stops the
    decode once enough pixels exist — a hostile stream cannot expand
    past the declared image size (decompression-bomb guard)."""
    # GIF spec: LZW minimum code size is 2..8 (codes cap at 12 bits).
    # The byte comes from untrusted data; without this bound a crafted
    # value (e.g. 255) makes the base-table allocation below ~2^255
    # tuples — an OS-level OOM that bypasses the max_out bomb guard.
    if not 2 <= min_code_size <= 8:
        raise GifFormatError(
            f"LZW minimum code size {min_code_size} outside spec range 2..8"
        )
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [(i,) for i in range(clear)] + [None, None]

    table = list(base)
    code_size = min_code_size + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out  # missing EOI: tolerate, return what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise GifFormatError(f"bad first code {code}")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + (entry[0],))
        elif code == len(table) and len(table) < 4096:
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise GifFormatError(f"LZW code {code} out of range")
        out.extend(entry)
        if max_out is not None and len(out) >= max_out:
            return out[:max_out]
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1


def lzw_encode_literal(indices: list[int], min_code_size: int) -> bytes:
    """Emit every index as a literal code, with a CLEAR before the table
    could grow — valid LZW by construction (no compression)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    # after CLEAR the decoder's table has eoi+1 entries; it adds one per
    # code after the first — stay comfortably under the width boundary
    span = max((1 << code_size) - eoi - 3, 1)
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for i, idx in enumerate(indices):
        if i and i % span == 0:
            emit(clear)
        if idx >= clear:
            raise GifFormatError(f"index {idx} exceeds palette")
        emit(idx)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def decode_gif(
    data: bytes, max_pixels: int = 64_000_000
) -> tuple[int, int, list[tuple[int, np.ndarray]]]:
    """GIF bytes → (width, height, [(delay_ms, (H, W, 3) uint8), ...]).
    ``max_pixels`` bounds per-frame allocation (the PNG-decoder guard:
    a crafted canvas quarantines, never OOMs)."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF")
    width, height, packed, bg_index, _ar = struct.unpack(
        "<HHBBB", data[6:13]
    )
    if width * height > max_pixels:
        raise GifFormatError(
            f"{width}x{height} exceeds max_pixels={max_pixels}"
        )
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise GifFormatError("truncated global color table")
        gct = np.frombuffer(
            data[pos:pos + 3 * n], dtype=np.uint8
        ).reshape(n, 3)
        pos += 3 * n
    canvas = np.zeros((height, width, 3), dtype=np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    background = canvas.copy()
    frames: list[tuple[int, np.ndarray]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(data):
                raise GifFormatError("truncated extension block")
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                body, pos = _read_subblocks(data, pos)
                if len(body) < 4:
                    raise GifFormatError("short graphic control block")
                flags, delay_cs, tidx = struct.unpack("<BHB", body[:4])
                disposal = (flags >> 2) & 0x07
                transparent = tidx if flags & 1 else None
                delay_ms = delay_cs * 10
            else:  # comment/app/plain-text: skip
                _body, pos = _read_subblocks(data, pos)
            continue
        if b != 0x2C:
            raise GifFormatError(f"unexpected block 0x{b:02x}")
        if pos + 9 > len(data):
            raise GifFormatError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        if ipacked & 0x40:
            raise GifFormatError("interlaced GIF unsupported")
        if disposal == 3:
            raise GifFormatError("disposal method 3 unsupported")
        if left + w > width or top + h > height:
            raise GifFormatError("image region exceeds canvas")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise GifFormatError("truncated local color table")
            pal = np.frombuffer(
                data[pos:pos + 3 * n], dtype=np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise GifFormatError("image without a color table")
        if pos >= len(data):
            raise GifFormatError("truncated before LZW code size")
        min_code = data[pos]
        if not 2 <= min_code <= 8:  # reject before any allocation
            raise GifFormatError(
                f"LZW minimum code size {min_code} outside spec range 2..8"
            )
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = np.array(
            lzw_decode(lzw, min_code, max_out=w * h), dtype=np.int64
        )
        if len(idx) < w * h:
            raise GifFormatError("LZW stream shorter than image")
        idx = idx.reshape(h, w)
        if np.any(idx >= len(pal)):
            raise GifFormatError("palette index out of range")
        region = canvas[top:top + h, left:left + w]
        rgb = pal[idx]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        # TOTAL decoded volume bound: the per-canvas cap alone would let
        # thousands of tiny descriptors each append a full-canvas copy
        if (len(frames) + 1) * width * height > max_pixels:
            raise GifFormatError(
                f"{len(frames) + 1} frames x {width}x{height} exceeds "
                f"max_pixels={max_pixels}"
            )
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:  # restore background in the frame's region
            canvas[top:top + h, left:left + w] = (
                background[top:top + h, left:left + w]
            )
        delay_ms = 0
        transparent = None
        disposal = 0
    if not frames:
        raise GifFormatError("no image frames")
    return width, height, frames


def probe_gif(
    data: bytes, max_pixels: int = 64_000_000
) -> tuple[int, int, int, int]:
    """(width, height, n_frames, duration_ms) from block headers only —
    sub-blocks are skipped, no LZW work. Rejects what decode_gif rejects,
    including canvases and frame totals over ``max_pixels``."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF")
    width, height, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if width * height > max_pixels:
        raise GifFormatError(
            f"{width}x{height} exceeds max_pixels={max_pixels}"
        )
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    duration_ms = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:
            break
        if b == 0x21:
            if pos >= len(data):
                raise GifFormatError("truncated extension block")
            label = data[pos]
            pos += 1
            if label == 0xF9:
                body, pos = _read_subblocks(data, pos)
                if len(body) >= 4:
                    (flags, delay_cs, _t) = struct.unpack("<BHB", body[:4])
                    if (flags >> 2) & 0x07 == 3:
                        raise GifFormatError("disposal method 3 unsupported")
                    duration_ms += delay_cs * 10
            else:
                pos = _skip_subblocks(data, pos)
            continue
        if b != 0x2C:
            raise GifFormatError(f"unexpected block 0x{b:02x}")
        if pos + 9 > len(data):
            raise GifFormatError("truncated image descriptor")
        _l, _t2, _w, _h, ipacked = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        # parity with decode_gif: a probe that admits what decode rejects
        # defeats probe-before-decode pruning (the png.py convention)
        if ipacked & 0x40:
            raise GifFormatError("interlaced GIF unsupported")
        if _l + _w > width or _t2 + _h > height:
            raise GifFormatError("image region exceeds canvas")
        if not (packed & 0x80) and not (ipacked & 0x80):
            raise GifFormatError("image without a color table")
        if ipacked & 0x80:
            pos += 3 * (2 << (ipacked & 0x07))
        if pos >= len(data):
            raise GifFormatError("truncated before LZW code size")
        if not 2 <= data[pos] <= 8:  # parity with decode_gif's bound
            raise GifFormatError(
                f"LZW minimum code size {data[pos]} outside spec range 2..8"
            )
        pos += 1  # LZW min code size
        pos = _skip_subblocks(data, pos)
        n_frames += 1
        if n_frames * width * height > max_pixels:
            raise GifFormatError(
                f"{n_frames} frames x {width}x{height} exceeds "
                f"max_pixels={max_pixels}"
            )
    if n_frames == 0:
        raise GifFormatError("no image frames")
    return width, height, n_frames, duration_ms


def encode_gif(
    frames: list[tuple[int, np.ndarray]],
    palette: np.ndarray,
) -> bytes:
    """[(delay_ms, (H, W) palette-index array)] + (N, 3) palette → GIF89a
    bytes (literal LZW, full-frame images, disposal 1)."""
    pal = np.asarray(palette, dtype=np.uint8)
    n = len(pal)
    bits = max(2, int(np.ceil(np.log2(n))) if n > 1 else 1)
    size = 1 << bits
    if n > 256 or not frames:
        raise GifFormatError("palette too large or no frames")
    h, w = np.asarray(frames[0][1]).shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes() + b"\x00" * (3 * (size - n))
    for delay_ms, idx in frames:
        a = np.asarray(idx, dtype=np.uint8)
        if a.shape != (h, w):
            raise GifFormatError("all frames must match the first's shape")
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 0x04, delay_ms // 10, 0
        ) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        min_code = max(bits, 2)
        out.append(min_code)
        lzw = lzw_encode_literal([int(v) for v in a.reshape(-1)], min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
