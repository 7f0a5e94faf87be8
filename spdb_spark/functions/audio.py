"""Dependency-free WAV (RIFF PCM) codec + deterministic audio frame
features, making the `kind='audio'` leg of the multimodal pipeline REAL.
FLAC payloads decode through functions/flac.py into the same shared
feature kernel (features_from_waveform), so lossless twins featurize
bit-for-bit identically.

Supports the formats that cover training-data audio interchange: integer
PCM (uint8 / int16 / int32), IEEE-float PCM (float32/float64, format
code 3), and G.711 telephony companding (A-law code 6, µ-law code 7,
expanded through functions/g711.py), any channel count, any sample rate.
Encode writes canonical-header files for every decodable format; decode
accepts extra chunks (LIST/fact/...) by walking the RIFF chunk list, as
real-world files require. numpy does all sample work — no per-sample
Python.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"
_FMT_PCM = 1
_FMT_FLOAT = 3
_FMT_ALAW = 6
_FMT_ULAW = 7

_WIDTH_DTYPES = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}
_FLOAT_DTYPES = {4: np.dtype("<f4"), 8: np.dtype("<f8")}


def wav_encode(
    samples: np.ndarray, sample_rate: int = 16000, companding: str | None = None
) -> bytes:
    """samples: (n,) mono or (n, channels). dtype uint8/int16/int32 writes
    integer PCM; float32/float64 writes IEEE-float PCM (format 3).
    companding='alaw'|'ulaw' (int16 input only) writes G.711 format 6/7."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"expected (n,) or (n, ch) samples, got {arr.shape}")
    if companding is not None:
        if arr.dtype != np.int16:
            raise ValueError("G.711 companding takes int16 samples")
        from spdb_spark.functions.g711 import alaw_encode, ulaw_encode

        fmt_code = _FMT_ALAW if companding == "alaw" else _FMT_ULAW
        if companding not in ("alaw", "ulaw"):
            raise ValueError(f"unknown companding {companding!r}")
        arr = (alaw_encode if companding == "alaw" else ulaw_encode)(arr)
        width = 1
    elif arr.dtype == np.uint8:
        fmt_code, width = _FMT_PCM, 1
    elif arr.dtype == np.int16:
        fmt_code, width = _FMT_PCM, 2
    elif arr.dtype == np.int32:
        fmt_code, width = _FMT_PCM, 4
    elif arr.dtype in (np.float32, np.float64):
        fmt_code, width = _FMT_FLOAT, arr.dtype.itemsize
    else:
        raise ValueError(f"unsupported sample dtype {arr.dtype}")
    n, ch = arr.shape
    data = np.ascontiguousarray(arr.astype(arr.dtype.newbyteorder("<"))).tobytes()
    fmt = struct.pack(
        "<HHIIHH",
        fmt_code,
        ch,
        sample_rate,
        sample_rate * ch * width,  # byte rate
        ch * width,  # block align
        width * 8,  # bits per sample
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """-> ((n, channels) sample array in the file dtype, sample_rate).
    Walks the chunk list, so files with LIST/fact/cue chunks decode."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    fmt = data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = chunk
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    width = bits // 8
    if audio_fmt == _FMT_PCM:
        if width not in _WIDTH_DTYPES:
            raise ValueError(f"unsupported sample width {bits} bits")
        flat = np.frombuffer(data, dtype=_WIDTH_DTYPES[width])
    elif audio_fmt == _FMT_FLOAT:
        if width not in _FLOAT_DTYPES:
            raise ValueError(f"unsupported float width {bits} bits")
        flat = np.frombuffer(data, dtype=_FLOAT_DTYPES[width])
    elif audio_fmt in (_FMT_ALAW, _FMT_ULAW):
        if width != 1:
            raise ValueError("G.711 WAV must be 8 bits per sample")
        from spdb_spark.functions.g711 import alaw_decode, ulaw_decode

        codes = np.frombuffer(data, dtype=np.uint8)
        flat = (alaw_decode if audio_fmt == _FMT_ALAW else ulaw_decode)(codes)
    else:
        raise ValueError(
            f"unsupported WAV format code {audio_fmt} "
            "(PCM/IEEE-float/A-law/mu-law only)"
        )
    return flat.reshape(-1, ch), rate


def _to_float(arr: np.ndarray) -> np.ndarray:
    """Samples -> [-1, 1] float64 mono mix."""
    if arr.dtype == np.uint8:
        x = (arr.astype(np.float64) - 128.0) / 128.0
    elif arr.dtype.kind == "f":
        x = arr.astype(np.float64)  # IEEE-float WAV is already normalized
    else:
        x = arr.astype(np.float64) / float(
            np.iinfo(arr.dtype).max + 1
        )
    return x.mean(axis=1)


def audio_frame_features(payload: bytes, n_frames: int, dim: int) -> np.ndarray:
    """Deterministic (n_frames, dim) features from a WAV payload: the
    waveform split into n_frames equal windows; per window the feature
    vector is [RMS energy, zero-crossing rate, dim-2 log-magnitude
    spectrum bands] — the classic cheap audio fingerprint, bit-stable
    across runs (plain numpy FFT, no randomness)."""
    samples, _rate = wav_decode(payload)
    return features_from_waveform(_to_float(samples), n_frames, dim)


def features_from_waveform(x: np.ndarray, n_frames: int, dim: int) -> np.ndarray:
    """The shared feature kernel over a [-1, 1] float mono waveform —
    WAV and FLAC payloads route here so lossless twins featurize
    bit-for-bit identically."""
    out = np.zeros((n_frames, dim), dtype=np.float32)
    if len(x) == 0:
        return out
    for f, win in enumerate(np.array_split(x, n_frames)):
        if win.size == 0:
            continue
        out[f, 0] = np.sqrt(np.mean(win * win))
        if dim > 1 and win.size > 1:
            out[f, 1] = np.mean(np.signbit(win[1:]) != np.signbit(win[:-1]))
        nb = dim - 2
        if nb > 0:
            mag = np.abs(np.fft.rfft(win))
            for d, band in enumerate(np.array_split(mag, nb)):
                if band.size:
                    out[f, 2 + d] = np.log1p(band.mean())
    return out
