"""Baseline JPEG codec: hand-computed bitstream vectors, IDCT
cross-check against a literal cos-sum loop, round-trip PSNR floors,
probe/decode parity, hostile-input quarantine."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from erigon_extract_spark.functions.jpeg import (
    _DCT_T,
    _ZZ,
    JpegFormatError,
    _build_codes,
    decode_jpeg,
    encode_jpeg,
    probe_jpeg,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            np.clip(100 + yy * 2, 0, 255),
            np.clip(50 + xx * 3, 0, 255),
            np.clip(80 + yy + xx, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)


def test_zigzag_is_the_spec_sequence():
    # first 10 entries of the T.81 zigzag scan, raster indices
    assert list(_ZZ[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(_ZZ) == list(range(64))


def test_idct_matches_literal_cos_sum():
    """The einsum IDCT must agree with the textbook double-loop DCT-III
    to float precision — an independent formulation of the same math."""
    rng = np.random.default_rng(3)
    coef = rng.normal(0, 50, size=(8, 8))
    fast = _DCT_T.T @ coef @ _DCT_T
    slow = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            slow[x, y] = s / 4
    assert np.allclose(fast, slow, atol=1e-9)


def test_huffman_codes_are_canonical_and_prefix_free():
    from erigon_extract_spark.functions.jpeg import (
        _AC_CHROMA,
        _AC_LUMA,
        _DC_CHROMA,
        _DC_LUMA,
    )

    for spec in (_DC_LUMA, _DC_CHROMA, _AC_LUMA, _AC_CHROMA):
        codes = _build_codes(*spec)
        seen = set()
        kraft = 0.0
        for sym, (code, ln) in codes.items():
            assert 0 <= code < (1 << ln)
            assert (code, ln) not in seen
            seen.add((code, ln))
            kraft += 2.0 ** -ln
        assert kraft <= 1.0 + 1e-12  # prefix-free (Kraft inequality)
        # prefix-freeness proper: no code is a prefix of another
        by_bits = {format(c, f"0{ln}b") for c, ln in seen}
        for a in by_bits:
            for b in by_bits:
                if a != b:
                    assert not b.startswith(a)


def test_solid_gray_block_hand_computed_bitstream():
    """Pin the bit-level conventions with a fully hand-derived vector:
    8x8 gray, value 130, quality 50 (Annex K tables unscaled, DC
    quantizer 16). Level shift 130-128=2; orthonormal DCT DC = 8*2=16;
    quantized DC = 1; all AC zero. Entropy stream: DC-luma symbol 1 =
    '010', magnitude bit '1', EOB = '1010' -> '01011010' = 0x5A, exactly
    one byte, no padding. The encoder must emit exactly that byte, and
    the decoder must invert it to a solid-130 block."""
    img = np.full((8, 8), 130, dtype=np.uint8)
    data = encode_jpeg(img, quality=50)
    # scan body sits between the SOS header and EOI
    sos = data.find(b"\xff\xda")
    (seglen,) = struct.unpack(">H", data[sos + 2:sos + 4])
    scan = data[sos + 2 + seglen:-2]
    assert scan == b"\x5a", scan.hex()
    assert data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == (8, 8, 1)
    assert np.all(out == 130)


def test_round_trip_psnr_floors():
    img = _gradient(40, 52)
    for quality, sub, floor in [
        (50, "444", 40.0),
        (85, "444", 45.0),
        (85, "420", 40.0),
        (95, "444", 48.0),
    ]:
        out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=sub))
        assert out.shape == img.shape
        p = _psnr(img, out)
        assert p >= floor, (quality, sub, p)
    # noise image: lower fidelity but still sane at high quality
    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    assert _psnr(noise, decode_jpeg(encode_jpeg(noise, quality=95))) >= 28.0


def test_restart_markers_round_trip_bit_exact_vs_no_restart():
    """DRI/RSTn only re-syncs the stream — decoded pixels must be
    IDENTICAL with and without restarts."""
    img = _gradient(32, 48)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    rst = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=2))
    assert np.array_equal(plain, rst)


def test_grayscale_and_odd_dimensions():
    yy, xx = np.mgrid[0:37, 0:41]
    g = ((yy * 5 + xx * 7) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (37, 41, 1)
    assert _psnr(g, out[:, :, 0]) >= 30.0
    # 420 with odd dims: padded sampling grid, cropped back exactly
    img = _gradient(19, 23)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert out.shape == (19, 23, 3)


def test_probe_parity_and_header_info():
    img = _gradient(40, 52)
    for sub in ("444", "420"):
        data = encode_jpeg(img, subsampling=sub)
        assert probe_jpeg(data) == (52, 40, 3)
    g = encode_jpeg(np.full((8, 8), 7, dtype=np.uint8))
    assert probe_jpeg(g) == (8, 8, 1)


def test_hostile_inputs_quarantine():
    img = _gradient(16, 16)
    good = encode_jpeg(img)

    # progressive SOF2 must be a loud format error in decode AND probe
    prog = bytearray(good)
    prog[prog.find(b"\xff\xc0") + 1] = 0xC2
    for fn in (decode_jpeg, probe_jpeg):
        with pytest.raises(JpegFormatError, match="progressive"):
            fn(bytes(prog))

    # giant declared canvas: rejected BEFORE allocation, decode and probe
    big = bytearray(good)
    i = big.find(b"\xff\xc0")
    big[i + 5:i + 9] = struct.pack(">HH", 65000, 65000)
    for fn in (decode_jpeg, probe_jpeg):
        with pytest.raises(JpegFormatError, match="max_pixels"):
            fn(bytes(big))

    # truncations at every marker boundary fail loudly, never crash
    for cut in (1, 2, 4, 20, len(good) // 2, len(good) - 3):
        with pytest.raises(JpegFormatError):
            decode_jpeg(good[:cut])

    # zero quantizer value
    zq = bytearray(good)
    i = zq.find(b"\xff\xdb")
    zq[i + 5] = 0  # first DQT entry
    with pytest.raises(JpegFormatError, match="zero quantizer"):
        decode_jpeg(bytes(zq))

    # sampling factor outside 1..2
    sf = bytearray(good)
    i = sf.find(b"\xff\xc0")
    sf[i + 11] = 0x41  # luma 4x1
    with pytest.raises(JpegFormatError, match="sampling factor"):
        decode_jpeg(bytes(sf))

    # overfull Huffman table: code space overflow must be caught at
    # parse time, not mid-scan
    from erigon_extract_spark.functions.jpeg import _build_decode_map

    with pytest.raises(JpegFormatError, match="code space"):
        _build_decode_map([0, 5, 0] + [0] * 13, list(range(5)))

    # not a JPEG at all
    with pytest.raises(JpegFormatError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")


def test_422_mixed_axis_round_trip():
    """Real 4:2:2 (luma 2x1): the mixed-axis sampling path — horizontal
    chroma downsample on encode, horizontal-only upsample on decode —
    round-trips above the 420 floor (it keeps full vertical chroma)."""
    img = _gradient(40, 52)
    p422 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=90,
                                              subsampling="422")))
    p420 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=90,
                                              subsampling="420")))
    assert p422 >= 42.0, p422
    assert p422 >= p420  # half the chroma loss of 420 on this gradient
    # odd dims through the mixed grid: padded and cropped back exactly
    odd = _gradient(19, 23)
    assert decode_jpeg(
        encode_jpeg(odd, quality=90, subsampling="422")
    ).shape == (19, 23, 3)


def test_single_component_scan_is_non_interleaved():
    """T.81 A.2: a one-component scan has MCU = 1 data unit and IGNORES
    the SOF sampling factors. A conforming grayscale file declaring 2x2
    sampling (common when luma factors survive from a color source) must
    decode IDENTICALLY to the 1x1 declaration — the interleaved reading
    would scramble block order and the DC prediction chain."""
    yy, xx = np.mgrid[0:37, 0:41]
    g = ((yy * 5 + xx * 7) % 256).astype(np.uint8)
    data = encode_jpeg(g, quality=90)
    forged = bytearray(data)
    i = forged.find(b"\xff\xc0")
    assert forged[i + 11] == 0x11
    forged[i + 11] = 0x22  # declare 2x2 luma sampling
    assert np.array_equal(decode_jpeg(data), decode_jpeg(bytes(forged)))
    assert probe_jpeg(bytes(forged)) == (41, 37, 1)


def test_probe_full_parse_time_parity_and_fill_bytes():
    """Probe walks DQT/DHT/DNL through the same parsers as decode —
    zero quantizers, overfull Huffman tables, and DNL segments are
    probe-rejected too (r5 review finding); legal 0xFF fill bytes
    before a marker are accepted by BOTH (T.81 B.1.1.2)."""
    img = _gradient(16, 16)
    good = encode_jpeg(img)

    zq = bytearray(good)
    zq[zq.find(b"\xff\xdb") + 5] = 0
    with pytest.raises(JpegFormatError, match="zero quantizer"):
        probe_jpeg(bytes(zq))

    dnl = good[:2] + b"\xff\xdc\x00\x04\x00\x10" + good[2:]
    for fn in (decode_jpeg, probe_jpeg):
        with pytest.raises(JpegFormatError, match="DNL"):
            fn(dnl)

    fill = good[:2] + b"\xff\xff" + good[3:]  # FF fill bytes before APP0
    assert probe_jpeg(fill) == (16, 16, 3)
    assert decode_jpeg(fill).shape == (16, 16, 3)


def test_encode_rejects_oversized_dims_with_value_error():
    with pytest.raises(ValueError, match="65535"):
        encode_jpeg(np.zeros((70000, 8), dtype=np.uint8))


def test_jpeg_through_spark_probe_and_resize(spark):
    """JPEG payloads route natively (no PIL) through the real multimodal
    probe and resize operators; malformed JPEG quarantines per-payload."""
    from erigon_extract_spark.operators.multimodal import (
        extract_media_metadata,
        resize_images,
    )

    img = _gradient(24, 40)
    good = encode_jpeg(img, quality=90)
    media = spark.createDataFrame(
        [(1, "image/jpeg", bytearray(good)),
         (2, "image/jpeg", b"\xff\xd8junk")],
        "doc_id long, mime string, payload binary",
    )
    meta = {r.doc_id: r for r in extract_media_metadata(
        media, fake_decode=False
    ).collect()}
    assert (meta[1].width, meta[1].height) == (40, 24)
    assert meta[2].decode_error and "Jpeg" in meta[2].decode_error
    out = {r.doc_id: r for r in resize_images(
        media, 10, 6, fake_decode=False
    ).collect()}
    back = decode_jpeg(bytes(out[1].payload))
    assert back.shape == (6, 10, 3)
    assert out[2].resize_error and "Jpeg" in out[2].resize_error


def test_probe_parity_is_structural():
    """r5 review pass 2: probe must also reject what decode rejects at
    parse time in the SOS-adjacent cases the first parity fix missed —
    missing SOS, malformed DRI, and an SOS/SOF component-count mismatch.
    Parity is now structural (one shared _parse_headers + _link_scan),
    so these pin the contract, not per-marker patches."""
    img = _gradient(8, 8)
    good = encode_jpeg(img)

    # (a) headers-only stream: everything up to SOS, then EOI
    sos = good.find(b"\xff\xda")
    headers_only = good[:sos] + b"\xff\xd9"
    for fn in (decode_jpeg, probe_jpeg):
        with pytest.raises(JpegFormatError, match="missing SOS"):
            fn(headers_only)

    # (b) DRI with a wrong body length
    bad_dri = good[:2] + b"\xff\xdd\x00\x05\x00\x10\x00" + good[2:]
    for fn in (decode_jpeg, probe_jpeg):
        with pytest.raises(JpegFormatError, match="bad DRI length"):
            fn(bad_dri)

    # (c) 3-component SOF with a 1-component SOS header
    tricolor = bytearray(encode_jpeg(_gradient(8, 8)))
    s = tricolor.find(b"\xff\xda")
    one_comp_sos = (
        bytes(tricolor[:s])
        + b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"
        + bytes(tricolor[s + 2 + 12:])
    )
    for fn in (decode_jpeg, probe_jpeg):
        with pytest.raises(JpegFormatError, match="partial scans"):
            fn(one_comp_sos)


def test_progressive_style_scan_header_rejected():
    """r5 advice: a SOF0 stream whose SOS carries progressive-style
    spectral selection / successive approximation (Ss,Se,Ah/Al other
    than 0,63,0) must fail loudly in BOTH decode and probe — not decode
    as full-spectrum sequential."""
    good = encode_jpeg(_gradient(8, 8))
    s = good.find(b"\xff\xda")
    (seglen,) = struct.unpack(">H", good[s + 2:s + 4])
    body = bytearray(good[s + 4:s + 2 + seglen])
    tail = good[s + 2 + seglen:]
    for ss, se, a in ((0, 5, 0), (1, 63, 0), (0, 63, 0x10)):
        body[-3:] = bytes([ss, se, a])
        bad = good[:s + 4] + bytes(body) + tail
        for fn in (decode_jpeg, probe_jpeg):
            with pytest.raises(JpegFormatError, match="non-baseline"):
                fn(bad)
    # sanity: restoring (0, 63, 0) decodes again
    body[-3:] = bytes([0, 63, 0])
    assert decode_jpeg(good[:s + 4] + bytes(body) + tail).shape == (8, 8, 3)
