"""Pure numpy WAV (RIFF/PCM) parsing and waveform features — the REAL
audio kernel for containers without soundfile/librosa.

WAV is a stdlib-shaped container: RIFF framing, an ``fmt `` chunk with
rate/channels/width, PCM samples in ``data``. Supported: PCM
(format tag 1) at 8/16/32-bit integer depth — the shapes speech corpora
overwhelmingly hold. Float/ADPCM/extensible raise ``WavFormatError``
loudly.

Features are one vectorized pass: RMS energy, peak, zero-crossing rate —
the standard cheap audio-quality signals (silence/clipping detection)
that gate a corpus before any model-based processing.
"""

from __future__ import annotations

import struct

import numpy as np


class WavFormatError(ValueError):
    """Unsupported or malformed WAV."""


_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}


def parse_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """WAV bytes → (sample_rate, n_channels, bits, samples[frames, ch])."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    pcm = None
    while pos + 8 <= len(data):
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            # a cut-off clip must quarantine, not parse as a shorter one
            raise WavFormatError("truncated chunk")
        if ctype == b"fmt ":
            if len(body) < 16:
                raise WavFormatError("short fmt chunk")
            tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag != 1:
                raise WavFormatError(f"unsupported format tag {tag} (not PCM)")
            if bits not in _DTYPES:
                raise WavFormatError(f"unsupported bit depth {bits}")
            if channels < 1 or rate < 1:
                raise WavFormatError(
                    f"invalid fmt: channels={channels} rate={rate}"
                )
        elif ctype == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise WavFormatError("missing fmt or data chunk")
    dt = _DTYPES[bits]
    n = len(pcm) // (np.dtype(dt).itemsize * channels)
    samples = np.frombuffer(
        pcm[: n * np.dtype(dt).itemsize * channels], dtype=dt
    ).reshape(n, channels)
    return rate, channels, bits, samples


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """(frames,) or (frames, channels) int16 array → WAV bytes."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    frames, channels = a.shape
    body = a.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def probe_wav(data: bytes) -> tuple[int, int, int, int]:
    """(sample_rate, n_channels, bits, duration_ms) without copying PCM:
    walks the chunk headers only, deriving duration from the data
    chunk's byte length — a metadata-only scan over a large audio corpus
    must not materialize every sample array."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = bits = None
    data_len = None
    while pos + 8 <= len(data):
        ctype = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        if pos + 8 + length > len(data):
            raise WavFormatError("truncated chunk")
        if ctype == b"fmt ":
            if length < 16:
                raise WavFormatError("short fmt chunk")
            tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", data[pos + 8:pos + 24]
            )
            if tag != 1:
                raise WavFormatError(f"unsupported format tag {tag} (not PCM)")
            if bits not in _DTYPES:
                raise WavFormatError(f"unsupported bit depth {bits}")
            if channels < 1 or rate < 1:
                raise WavFormatError(
                    f"invalid fmt: channels={channels} rate={rate}"
                )
        elif ctype == b"data":
            data_len = length
        pos += 8 + length + (length & 1)
    if rate is None or data_len is None:
        raise WavFormatError("missing fmt or data chunk")
    frames = data_len // (np.dtype(_DTYPES[bits]).itemsize * channels)
    return rate, channels, bits, int(frames * 1000 // rate)


def wav_features(data: bytes) -> dict[str, float]:
    """One-pass waveform quality features over the mono mix: RMS level,
    peak level (both normalized to [0, 1]), zero-crossing rate per
    second, and silence flag (RMS < 1% full scale)."""
    rate, _channels, bits, samples = parse_wav(data)
    if len(samples) == 0:
        return {"rms": 0.0, "peak": 0.0, "zcr_per_s": 0.0, "silent": True}
    x = samples.astype(np.float64)
    if bits == 8:  # unsigned midpoint 128
        x = x - 128.0
        full = 128.0
    else:
        full = float(2 ** (bits - 1))
    mono = x.mean(axis=1)
    rms = float(np.sqrt(np.mean(mono**2)) / full)
    peak = float(np.max(np.abs(mono)) / full)
    signs = np.sign(mono)
    crossings = int(np.count_nonzero(np.diff(signs[signs != 0])))
    zcr = crossings * rate / max(len(mono), 1)
    return {
        "rms": round(rms, 9),
        "peak": round(peak, 9),
        "zcr_per_s": round(float(zcr), 6),
        "silent": rms < 0.01,
    }
