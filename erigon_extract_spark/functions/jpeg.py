"""Pure numpy baseline-JPEG codec — the REAL image kernel for the format
training corpora overwhelmingly hold, for containers without PIL/OpenCV
(companion to functions/png.py, same quarantine contract).

Scope (ITU-T T.81 / ISO 10918-1, all public): BASELINE SEQUENTIAL DCT,
8-bit precision, grayscale or 3-component YCbCr (JFIF), sampling factors
1 or 2 per axis (4:4:4, 4:2:2, 4:2:0 — the shapes real corpora hold),
restart markers. Everything else — progressive (SOF2), arithmetic coding,
hierarchical, 12-bit, DNL — raises ``JpegFormatError`` so a cluster fails
loudly, not wrongly.

Hostile-input posture (the png/gif convention): every length, count, and
table index from untrusted bytes is bounds-checked BEFORE any allocation
it sizes; ``max_pixels`` caps the decoded canvas; Huffman tables are
validated against code-space overflow; a truncated entropy stream is a
format error, not an index crash. One image decodes inside one
Arrow-batch task; nothing here touches Spark.

Performance shape: marker parsing and entropy decoding are per-symbol
Python (irreducibly serial bit twiddling), but the heavy math — dequant,
IDCT, level shift, color transform, subsample/upsample — runs as single
numpy tensor ops over ALL blocks of a component at once (`einsum` over
an (n, 8, 8) stack), which is where >90% of decode time goes.

Codec conventions pinned by tests/test_jpeg.py: hand-computed bitstreams
for solid-color blocks (byte order, stuffing, level shift, magnitude
coding), an IDCT cross-check against a literal cos-sum double loop, and
encode→decode PSNR floors at multiple qualities and subsamplings.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegFormatError(ValueError):
    """Unsupported or malformed JPEG."""


# --------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — public spec constants)
# --------------------------------------------------------------------------

def _zigzag() -> np.ndarray:
    """Zigzag index i -> raster index, generated (not typed) to avoid
    transcription defects: diagonals s=r+c, odd s walks down-left."""
    zz = []
    for s in range(15):
        diag = [(r, s - r) for r in range(max(0, s - 7), min(s, 7) + 1)]
        if s % 2 == 0:
            diag.reverse()
        zz.extend(diag)
    return np.array([r * 8 + c for r, c in zz], dtype=np.int64)


_ZZ = _zigzag()

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# (bits[1..16], values) per Annex K; both encoder and decoder carry these
# through DHT segments in the file, so the FILE is self-describing — the
# constants only determine what this encoder emits.
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
     0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
     0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
     0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
     0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
     0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
     0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
     0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
     0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
     0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
     0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
     0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
     0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
     0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
     0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
     0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
     0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
     0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
     0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
     0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
     0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
     0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
     0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
     0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
     0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
     0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
     0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
     0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
     0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
     0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
     0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
     0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
     0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
     0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
     0xF9, 0xFA],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: forward X = T @ x @ T.T,
    inverse x = T.T @ X @ T."""
    n = np.arange(8)
    k = n.reshape(8, 1)
    t = np.cos((2 * n + 1) * k * np.pi / 16) / 2
    t[0, :] = 1 / np.sqrt(8)
    return t


_DCT_T = _dct_matrix()


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> per-coefficient divisors in 1..255."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# --------------------------------------------------------------------------
# Huffman table construction (canonical codes from (bits, values))
# --------------------------------------------------------------------------

def _build_codes(bits: list[int], values: list[int]):
    """(bits, values) -> {symbol: (code, length)} in canonical order, with
    code-space validation (an overfull table would make entropy decode
    ambiguous — reject at parse time, not mid-scan)."""
    if len(bits) != 16:
        raise JpegFormatError("DHT bits list must have 16 entries")
    if sum(bits) != len(values):
        raise JpegFormatError("DHT value count disagrees with bits")
    if len(values) > 256:
        raise JpegFormatError("DHT declares more than 256 symbols")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        if code >= (1 << length) and bits[length - 1]:
            raise JpegFormatError("DHT code space overflow")
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise JpegFormatError("DHT code space overflow")
            codes[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], values: list[int]):
    """(bits, values) -> {(length, code): symbol} for the reader."""
    return {(ln, c): sym for sym, (c, ln) in _build_codes(bits, values).items()}


# --------------------------------------------------------------------------
# Bit I/O (big-endian bit order, 0xFF byte stuffing per T.81 B.1.1.5)
# --------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    """Reads entropy-coded bits from the scan, un-stuffing FF00 and
    stopping at any real marker (which the caller then inspects)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise JpegFormatError("entropy stream truncated at marker")
        if self.pos >= len(self.data):
            raise JpegFormatError("entropy stream truncated")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise JpegFormatError("entropy stream truncated after FF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed data byte
            else:
                # real marker: signal end of this entropy segment
                self.marker = nxt
                self.pos += 1
                raise JpegFormatError("entropy stream truncated at marker")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker for restart n%8."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet hit while decoding: scan forward for it
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
        want = 0xD0 + (n % 8)
        if self.marker != want:
            raise JpegFormatError(
                f"expected RST{n % 8} marker, found "
                f"{self.marker if self.marker is None else hex(self.marker)}"
            )
        self.marker = None


def _decode_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegFormatError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    """Magnitude-category decode (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    """Bit length of |v| (0 for 0) — the DC/AC size category."""
    return int(abs(v)).bit_length()


# --------------------------------------------------------------------------
# Shared segment parsers (decode and probe validate IDENTICALLY — the
# probe/decode parity contract)
# --------------------------------------------------------------------------

def _parse_dqt(body: bytes) -> dict[int, np.ndarray]:
    """DQT segment -> {table_id: 64 raster-order int64 divisors}."""
    out: dict[int, np.ndarray] = {}
    b = 0
    while b < len(body):
        pq, tq_id = body[b] >> 4, body[b] & 0x0F
        b += 1
        if pq not in (0, 1):
            raise JpegFormatError(f"bad DQT precision {pq}")
        n = 64 * (2 if pq else 1)
        if b + n > len(body):
            raise JpegFormatError("truncated DQT")
        if pq:
            vals = np.frombuffer(body[b:b + n], dtype=">u2").astype(np.int64)
        else:
            vals = np.frombuffer(
                body[b:b + n], dtype=np.uint8
            ).astype(np.int64)
        if np.any(vals == 0):
            raise JpegFormatError("zero quantizer value")
        table = np.empty(64, dtype=np.int64)
        table[_ZZ] = vals  # DQT stores zigzag order
        out[tq_id] = table
        b += n
    return out


def _parse_dht(body: bytes) -> list[tuple[int, int, dict]]:
    """DHT segment -> [(class, id, decode_map)] with full code-space
    validation (an overfull table is rejected here, not mid-scan)."""
    out = []
    b = 0
    while b < len(body):
        if b + 17 > len(body):
            raise JpegFormatError("truncated DHT")
        tc, th = body[b] >> 4, body[b] & 0x0F
        bits = list(body[b + 1:b + 17])
        nvals = sum(bits)
        if b + 17 + nvals > len(body):
            raise JpegFormatError("truncated DHT values")
        values = list(body[b + 17:b + 17 + nvals])
        if tc not in (0, 1):
            raise JpegFormatError(f"bad DHT class {tc}")
        out.append((tc, th, _build_decode_map(bits, values)))
        b += 17 + nvals
    return out


def _parse_sof(body: bytes, max_pixels: int):
    """SOF0/SOF1 segment -> (w, h, comps, hmax, vmax) with every
    header-level rejection both decode and probe apply."""
    if len(body) < 6:
        raise JpegFormatError("truncated SOF")
    precision, h, w, ncomp = struct.unpack(">BHHB", body[:6])
    if precision != 8:
        raise JpegFormatError(f"unsupported precision {precision}")
    if ncomp not in (1, 3):
        raise JpegFormatError(f"unsupported component count {ncomp}")
    if w == 0 or h == 0:
        raise JpegFormatError("zero image dimension")
    if len(body) < 6 + 3 * ncomp:
        raise JpegFormatError("truncated SOF components")
    comps = []
    for i in range(ncomp):
        cid, hv, tq_id = body[6 + 3 * i:9 + 3 * i]
        hs, vs = hv >> 4, hv & 0x0F
        if hs not in (1, 2) or vs not in (1, 2):
            raise JpegFormatError(
                f"sampling factor {hs}x{vs} outside supported 1..2"
            )
        comps.append((cid, hs, vs, tq_id))
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    pw = -(-w // (8 * hmax)) * 8 * hmax
    ph = -(-h // (8 * vmax)) * 8 * vmax
    if pw * ph > max_pixels:
        raise JpegFormatError(
            f"{w}x{h} (padded {pw}x{ph}) exceeds max_pixels={max_pixels}"
        )
    return w, h, comps, hmax, vmax


_UNSUPPORTED_SOF = {
    0xC2: "progressive", 0xC3: "SOF3", 0xC5: "SOF5", 0xC6: "SOF6",
    0xC7: "SOF7", 0xC9: "SOF9", 0xCA: "SOF10", 0xCB: "SOF11",
    0xCD: "SOF13", 0xCE: "SOF14", 0xCF: "SOF15",
}


def _next_marker(data: bytes, pos: int) -> tuple[int, int]:
    """Read a marker at ``pos`` (expects 0xFF), skipping any number of
    legal 0xFF fill bytes (T.81 B.1.1.2) -> (marker, new_pos)."""
    if data[pos] != 0xFF:
        raise JpegFormatError(f"expected marker at byte {pos}")
    pos += 1
    while pos < len(data) and data[pos] == 0xFF:
        pos += 1  # fill byte
    if pos >= len(data):
        raise JpegFormatError("truncated at marker")
    return data[pos], pos + 1


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def _parse_headers(data: bytes, max_pixels: int):
    """The ONE header walk both decode_jpeg and probe_jpeg run — every
    parse-time validation lives here (or in _link_scan), so probe/decode
    parity is structural, not two hand-synchronized loops (the r5 review
    found the duplicated-loop version drifting on DRI validation).

    Returns (qt, dc_maps, ac_maps, frame, restart_interval, sos_body,
    scan_pos); sos_body is None when the stream ends without a scan."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegFormatError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    frame = None  # (w, h, comps, hmax, vmax); comps: (cid, hs, vs, tq)
    restart_interval = 0

    while pos + 3 <= len(data):
        marker, pos = _next_marker(data, pos)
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(data):
            raise JpegFormatError("truncated segment length")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        if seglen < 2 or pos + seglen > len(data):
            raise JpegFormatError("segment length out of bounds")
        body = data[pos + 2:pos + seglen]
        pos += seglen

        if marker == 0xDB:  # DQT
            qt.update(_parse_dqt(body))
        elif marker == 0xC4:  # DHT
            for tc, th, dmap in _parse_dht(body):
                (dc_maps if tc == 0 else ac_maps)[th] = dmap
        elif marker == 0xC0 or marker == 0xC1:
            # SOF0 baseline / SOF1 extended-sequential (same decode at
            # 8-bit precision); dims/sampling/canvas bounds checked
            # BEFORE any allocation they size
            frame = _parse_sof(body, max_pixels)
        elif marker in _UNSUPPORTED_SOF:
            raise JpegFormatError(
                f"unsupported JPEG type: {_UNSUPPORTED_SOF[marker]}"
            )
        elif marker == 0xDC:  # DNL: redefines line count mid-stream
            raise JpegFormatError("DNL segments unsupported")
        elif marker == 0xDD:  # DRI
            if len(body) != 2:
                raise JpegFormatError("bad DRI length")
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            return qt, dc_maps, ac_maps, frame, restart_interval, body, pos
        # all other markers (APPn, COM): skipped via seglen
    return qt, dc_maps, ac_maps, frame, restart_interval, None, pos


def _link_scan(frame, body, qt, dc_maps, ac_maps) -> dict:
    """Validate the SOS header against the frame and table set (shared by
    decode and probe): component coverage, quant/Huffman table presence.
    Returns {component_id: (dc_table, ac_table)}."""
    _w, _h, comps, _hmax, _vmax = frame
    ns = body[0] if body else 0
    if ns != len(comps):
        raise JpegFormatError(
            "non-interleaved or partial scans unsupported"
        )
    if len(body) < 1 + 2 * ns + 3:
        raise JpegFormatError("truncated SOS")
    # Baseline sequential requires Ss=0, Se=63, Ah=Al=0 (T.81 B.2.3); a
    # progressive-style scan header on a SOF0 file must fail loudly, not
    # decode as full-spectrum sequential.
    ss, se, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    if (ss, se, a) != (0, 63, 0):
        raise JpegFormatError(
            f"non-baseline scan header Ss={ss} Se={se} AhAl={a:#04x}"
        )
    sel = {}
    for i in range(ns):
        cs, tt = body[1 + 2 * i], body[2 + 2 * i]
        sel[cs] = (tt >> 4, tt & 0x0F)
    for cid, _hs, _vs, tq_id in comps:
        if tq_id not in qt:
            raise JpegFormatError(f"missing quant table {tq_id}")
        if cid not in sel:
            raise JpegFormatError(f"scan omits component {cid}")
        td, ta = sel[cid]
        if td not in dc_maps or ta not in ac_maps:
            raise JpegFormatError(f"missing Huffman table {td}/{ta}")
    return sel


def decode_jpeg(data: bytes, max_pixels: int = 64_000_000) -> np.ndarray:
    """JPEG bytes → (H, W, 3) RGB or (H, W, 1) grayscale uint8.

    Baseline sequential only; see module docstring for the exact scope.
    ``max_pixels`` bounds the decoded canvas INCLUDING the sampling-grid
    padding, so a crafted SOF cannot size a giant allocation."""
    qt, dc_maps, ac_maps, frame, restart_interval, sos_body, scan_pos = (
        _parse_headers(data, max_pixels)
    )
    if sos_body is None:
        raise JpegFormatError("no scan data (missing SOS)")
    sel = _link_scan(frame, sos_body, qt, dc_maps, ac_maps)
    w, h, comps, hmax, vmax = frame
    planes = _decode_scan(
        data, scan_pos, comps, sel, qt, dc_maps, ac_maps,
        w, h, hmax, vmax, restart_interval,
    )
    if len(comps) == 1:
        return planes[0][:h, :w, None]
    ycc = np.stack([p[:h, :w] for p in planes], axis=2).astype(np.float64)
    return _ycbcr_to_rgb(ycc)


def _decode_scan(data, pos, comps, sel, qt, dc_maps, ac_maps,
                 w, h, hmax, vmax, restart_interval):
    """Entropy-decode the single baseline scan into full-size (padded)
    per-component planes. A single-component scan is NON-INTERLEAVED by
    definition (T.81 A.2): its MCU is one data unit and the SOF sampling
    factors do not shape the stream — treating it as interleaved would
    scramble block order and the DC prediction chain on conforming
    grayscale files that declare e.g. 2x2 sampling."""
    if len(comps) == 1:
        cid, _hs, _vs, tq = comps[0]
        comps = [(cid, 1, 1, tq)]
        hmax = vmax = 1
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comp_info = []
    for cid, hs, vs, tq_id in comps:
        # table presence already validated by _link_scan (shared with
        # probe_jpeg — the parse-time parity contract)
        td, ta = sel[cid]
        bw, bh = mcus_x * hs, mcus_y * vs  # blocks per axis
        comp_info.append({
            "hs": hs, "vs": vs, "q": qt[tq_id],
            "dc": dc_maps[td], "ac": ac_maps[ta],
            "bw": bw,
            "coefs": np.zeros((bh * bw, 64), dtype=np.int64),
            "pred": 0,
        })
    reader = _BitReader(data, pos)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                n = mcu // restart_interval - 1
                reader.align_and_expect_rst(n)
                for ci in comp_info:
                    ci["pred"] = 0
            for ci in comp_info:
                for v in range(ci["vs"]):
                    for hh in range(ci["hs"]):
                        by = my * ci["vs"] + v
                        bx = mx * ci["hs"] + hh
                        _decode_block(
                            reader, ci, ci["coefs"][by * ci["bw"] + bx]
                        )
            mcu += 1
    planes = []
    for (cid, hs, vs, _tq), ci in zip(comps, comp_info):
        # de-zigzag FIRST (rows are scan-ordered), then dequantize with
        # the raster-ordered table
        blocks = (ci["coefs"][:, _ZZ_INV] * ci["q"]).reshape(-1, 8, 8)
        pix = np.einsum(
            "ij,njk,kl->nil", _DCT_T.T, blocks.astype(np.float64), _DCT_T
        )
        bw = ci["bw"]
        bh = blocks.shape[0] // bw
        plane = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        plane = np.clip(np.round(plane + 128), 0, 255).astype(np.uint8)
        # upsample to the luma grid
        if hs != hmax:
            plane = np.repeat(plane, hmax // hs, axis=1)
        if vs != vmax:
            plane = np.repeat(plane, vmax // vs, axis=0)
        planes.append(plane)
    return planes


# zigzag raster<->scan inverse: _ZZ maps scan position -> raster index,
# _ZZ_INV maps raster index -> scan position (used to de-zigzag a row of
# 64 scan-ordered coefficients with one fancy-index)
_ZZ_INV = np.argsort(_ZZ)


def _decode_block(reader: _BitReader, ci: dict, out: np.ndarray) -> None:
    """One 8x8 block: DC diff + AC run-length, into zigzag-ordered out."""
    s = _decode_symbol(reader, ci["dc"])
    if s > 11:
        raise JpegFormatError(f"DC category {s} out of range")
    diff = _extend(reader.receive(s), s) if s else 0
    ci["pred"] += diff
    out[0] = ci["pred"]
    k = 1
    while k < 64:
        rs = _decode_symbol(reader, ci["ac"])
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegFormatError("AC run exceeds block")
        if s > 10:
            raise JpegFormatError(f"AC category {s} out of range")
        out[k] = _extend(reader.receive(s), s)
        k += 1


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """JFIF/BT.601 full-range inverse transform."""
    y = ycc[:, :, 0]
    cb = ycc[:, :, 1] - 128.0
    cr = ycc[:, :, 2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=2,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    return np.stack(
        [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ],
        axis=2,
    )


def _forward_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (multiple of 8) -> (n, 64) zigzag-ordered
    quantized coefficients, all blocks in one tensor op."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coef = np.einsum("ij,njk,kl->nil", _DCT_T, blocks, _DCT_T.T)
    qcoef = np.round(coef.reshape(-1, 64) / q.astype(np.float64))
    return qcoef.astype(np.int64)[:, _ZZ]


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-pad a plane so both dims are multiples of (mh, mw)."""
    ph = -(-plane.shape[0] // mh) * mh - plane.shape[0]
    pw = -(-plane.shape[1] // mw) * mw - plane.shape[1]
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_block(writer: _BitWriter, coef: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    diff = int(coef[0]) - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    last_nz = int(np.max(np.nonzero(coef)[0])) if np.any(coef[1:]) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while coef[k] == 0:
            run += 1
            k += 1
        while run > 15:
            zc, zl = ac_codes[0xF0]
            writer.write(zc, zl)  # ZRL
            run -= 16
        v = int(coef[k])
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        k += 1
    if last_nz < 63:
        code, ln = ac_codes[0x00]
        writer.write(code, ln)  # EOB
    return int(coef[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(H, W[, C]) uint8 -> baseline JFIF JPEG bytes. C=1/absent writes
    grayscale; C=3 writes YCbCr with 4:4:4, 4:2:2, or 4:2:0
    (``subsampling``). ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (the stream-resync feature real encoders use
    for robustness; here it also round-trip-exercises the decoder's
    restart path)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg expects (H, W), (H, W, 1) or (H, W, 3)")
    if subsampling not in ("444", "422", "420"):
        raise ValueError("subsampling must be '444', '422' or '420'")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h > 65535 or w > 65535:
        # SOF dimension fields are u16; raise the module's controlled
        # error class instead of leaking struct.error mid-assembly
        raise ValueError(f"{w}x{h} exceeds the JPEG 65535-pixel dim limit")
    gray = a.shape[2] == 1
    # luma sampling factors (horizontal, vertical); chroma is always 1x1
    sh, sv = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}[subsampling]
    if gray:
        sh = sv = 1

    ql = _scaled_quant(_QUANT_LUMA, quality)
    qc = _scaled_quant(_QUANT_CHROMA, quality)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"  # APP0

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
                + bytes(int(x) for x in table[_ZZ]))

    out += dqt(0, ql)
    if not gray:
        out += dqt(1, qc)

    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    sof += bytes([1, (sh << 4) | sv, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc: int, th: int, spec) -> bytes:
        bits, values = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([ncomp, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    # planes on the sampling grid
    if gray:
        planes = [(_pad_to(a[:, :, 0].astype(np.float64), 8, 8), ql, 1, 1)]
    else:
        ycc = _rgb_to_ycbcr(a)
        ypad = _pad_to(ycc[:, :, 0], 8 * sv, 8 * sh)
        chroma = []
        for c in (1, 2):
            p = _pad_to(ycc[:, :, c], 8 * sv, 8 * sh)
            if sh > 1 or sv > 1:
                ph, pw = p.shape
                # box mean over the sv x sh sampling block
                p = p.reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            chroma.append(p)
        planes = [(ypad, ql, sh, sv)] + [(p, qc, 1, 1) for p in chroma]

    coefs = [_forward_blocks(p, q) for p, q, _hs, _vs in planes]
    dc_l, ac_l = _build_codes(*_DC_LUMA), _build_codes(*_AC_LUMA)
    dc_c, ac_c = _build_codes(*_DC_CHROMA), _build_codes(*_AC_CHROMA)
    tables = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    writer = _BitWriter()
    mcus_x = planes[0][0].shape[1] // (8 * planes[0][2])
    mcus_y = planes[0][0].shape[0] // (8 * planes[0][3])
    preds = [0] * len(planes)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                writer.flush()
                n = mcu // restart_interval - 1
                writer.out += bytes([0xFF, 0xD0 + (n % 8)])
                preds = [0] * len(planes)
            mcu += 1
            for i, ((plane, _q, hs, vs), (dc, ac)) in enumerate(
                zip(planes, tables)
            ):
                bw = plane.shape[1] // 8
                for v in range(vs):
                    for hh in range(hs):
                        by = my * vs + v
                        bx = mx * hs + hh
                        preds[i] = _encode_block(
                            writer, coefs[i][by * bw + bx], preds[i], dc, ac
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Probe
# --------------------------------------------------------------------------

def probe_jpeg(
    data: bytes, max_pixels: int = 64_000_000
) -> tuple[int, int, int]:
    """Header-only probe -> (width, height, n_components). Runs the SAME
    _parse_headers walk and _link_scan validation as decode_jpeg —
    probe/decode parity is structural: any file probe admits, decode
    accepts at parse time (entropy-stream defects are by nature only
    visible to the full decode)."""
    qt, dc_maps, ac_maps, frame, _ri, sos_body, _pos = _parse_headers(
        data, max_pixels
    )
    if frame is None:
        raise JpegFormatError("no SOF frame header found")
    if sos_body is None:
        raise JpegFormatError("no scan data (missing SOS)")
    _link_scan(frame, sos_body, qt, dc_maps, ac_maps)
    w, h, comps, _hmax, _vmax = frame
    return w, h, len(comps)
