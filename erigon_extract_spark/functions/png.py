"""Pure numpy+zlib PNG codec and bilinear resize — the REAL image kernel
for containers without PIL/OpenCV.

PNG's container is stdlib-decodable: chunks framed by length/type/CRC32,
pixel data deflate-compressed (zlib) with one filter byte per row
(RFC 2083). Supported: 8-bit depth, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), non-interlaced — the shapes training corpora
overwhelmingly hold. Unsupported shapes (palette, 16-bit, Adam7) raise
``PngFormatError`` so a cluster fails loudly, not wrongly.

Filters: None/Up are full-row numpy ops; Sub is a per-channel cumulative
sum (mod-256 arithmetic is exact in int32 then cast); Average/Paeth carry
a left-pixel dependency and run as a per-pixel column loop — rare in
practice (encoders favor 0/1/2 on photographic rows) and still bounded by
row width.

Scale: one image decodes inside one Arrow-batch task; nothing here touches
Spark. The resize is vectorized gather + lerp, O(out_pixels).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Unsupported or malformed PNG."""


def decode_png(data: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 array. ``max_pixels`` bounds the
    decoded allocation — a crafted header declaring a giant canvas must
    quarantine as a format error, not OOM the executor."""
    if len(data) < 8 or data[:8] != _SIGNATURE:
        raise PngFormatError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngFormatError("truncated chunk")
        if ctype == b"IHDR":
            if length != 13:
                # a lying length field must surface as a format error, not
                # a struct.error the quarantine path doesn't catch
                raise PngFormatError(f"bad IHDR length {length}")
            width, height, depth, color, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise PngFormatError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngFormatError(f"unsupported color type {color}")
            if interlace:
                raise PngFormatError("interlaced PNG unsupported")
            if width * height > max_pixels:
                raise PngFormatError(
                    f"{width}x{height} exceeds max_pixels={max_pixels}"
                )
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + body + crc
    if width is None or not idat:
        raise PngFormatError("missing IHDR or IDAT")
    stride = width * channels
    expected = height * (stride + 1)
    try:
        # bounded inflate: a deflate bomb must fail the size check, not
        # allocate its full output first (deflate packs ~1000:1)
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise PngFormatError(f"corrupt deflate stream: {exc}") from exc
    if len(raw) != expected or dec.unconsumed_tail:
        raise PngFormatError("pixel data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = rows[:, 0]
    filt = rows[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), dtype=np.int32)
    bpp = channels
    for y in range(height):
        f = filters[y]
        line = filt[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        if f == 0:  # None
            out[y] = line
        elif f == 1:  # Sub: recon[x] = line[x] + recon[x-bpp]
            acc = line.reshape(width, bpp)
            out[y] = (np.cumsum(acc, axis=0) % 256).reshape(stride)
        elif f == 2:  # Up
            out[y] = (line + prev) % 256
        elif f == 3:  # Average
            cur = out[y]
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (line[x] + ((left + prev[x]) >> 1)) % 256
        elif f == 4:  # Paeth
            cur = out[y]
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) % 256
        else:
            raise PngFormatError(f"unknown filter {f} on row {y}")
    return out.astype(np.uint8).reshape(height, width, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, C) or (H, W) uint8 array → PNG bytes (filter 0, zlib)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 2, 3, 4):
        raise PngFormatError(f"cannot encode shape {a.shape}")
    height, width, channels = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = bytearray()
    flat = a.reshape(height, width * channels)
    for y in range(height):
        raw.append(0)  # filter None
        raw.extend(flat[y].tobytes())
    idat = zlib.compress(bytes(raw), 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def probe_png(
    data: bytes, max_pixels: int = 64_000_000
) -> tuple[int, int, int]:
    """(width, height, channels) from the IHDR without decompressing.

    Rejects exactly the shapes ``decode_png`` rejects (16-bit, palette,
    interlaced, oversized) — a metadata pass that admits images the
    decode stage then fails on would defeat probe-before-decode
    pruning."""
    if len(data) < 33 or data[:8] != _SIGNATURE or data[12:16] != b"IHDR":
        raise PngFormatError("not a PNG")
    width, height, depth, color, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    if width * height > max_pixels:
        raise PngFormatError(
            f"{width}x{height} exceeds max_pixels={max_pixels}"
        )
    if depth != 8:
        raise PngFormatError(f"unsupported bit depth {depth}")
    if color not in _CHANNELS:
        raise PngFormatError(f"unsupported color type {color}")
    if interlace:
        raise PngFormatError("interlaced PNG unsupported")
    return width, height, _CHANNELS[color]


def resize_bilinear(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized bilinear resample of an (H, W, C) uint8 array — the
    align-corners=False convention (pixel centers at half-integers, the
    torchvision/OpenCV default)."""
    a = np.asarray(arr, dtype=np.float32)
    if a.ndim == 2:
        a = a[:, :, None]
    in_h, in_w = a.shape[:2]
    if out_w < 1 or out_h < 1:
        raise ValueError("target dims must be positive")
    ys = (np.arange(out_h, dtype=np.float32) + 0.5) * in_h / out_h - 0.5
    xs = (np.arange(out_w, dtype=np.float32) + 0.5) * in_w / out_w - 0.5
    y0 = np.clip(np.floor(ys), 0, in_h - 1).astype(np.int64)
    x0 = np.clip(np.floor(xs), 0, in_w - 1).astype(np.int64)
    y1 = np.clip(y0 + 1, 0, in_h - 1)
    x1 = np.clip(x0 + 1, 0, in_w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    ay0 = a[y0]
    ay1 = a[y1]
    top = ay0[:, x0] * (1 - wx) + ay0[:, x1] * wx
    bot = ay1[:, x0] * (1 - wx) + ay1[:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
