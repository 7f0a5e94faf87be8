"""G.711 companding + extended WAV format tests (IEEE float, A-law,
µ-law). The companders are pinned to the published G.711 invariants:
peak magnitudes (µ-law 32124, A-law 32256), the two-zero-codes property,
full-code idempotence, segment monotonicity, and worst-case quantization
error bounded by the top-segment half step."""

import numpy as np
import pytest

from spdb_spark.functions.audio import (
    audio_frame_features,
    wav_decode,
    wav_encode,
)
from spdb_spark.functions.g711 import (
    alaw_decode,
    alaw_encode,
    ulaw_decode,
    ulaw_encode,
)

ALL_CODES = np.arange(256, dtype=np.uint8)
ALL_INT16 = np.arange(-32768, 32768, dtype=np.int16)


def test_published_peaks_and_zeros():
    assert ulaw_decode(np.array([0x80], np.uint8))[0] == 32124
    assert ulaw_decode(np.array([0x00], np.uint8))[0] == -32124
    # both µ-law zero codes decode to 0 (0xFF = +0, 0x7F = -0)
    assert ulaw_decode(np.array([0xFF, 0x7F], np.uint8)).tolist() == [0, 0]
    assert alaw_decode(np.array([0xAA], np.uint8))[0] == 32256
    assert alaw_decode(np.array([0x2A], np.uint8))[0] == -32256
    # smallest A-law magnitudes are +-8 (no zero code)
    assert alaw_decode(np.array([0xD5, 0x55], np.uint8)).tolist() == [8, -8]


def test_all_codes_idempotent():
    # every code is a quantizer fixed point — except µ-law -0 (0x7F),
    # which canonically re-encodes as +0 (0xFF)
    ur = ulaw_encode(ulaw_decode(ALL_CODES))
    mismatch = ALL_CODES[ur != ALL_CODES]
    assert mismatch.tolist() == [0x7F]
    assert ur[0x7F] == 0xFF
    assert (alaw_encode(alaw_decode(ALL_CODES)) == ALL_CODES).all()


def test_quantization_error_bounded_every_int16():
    du = ulaw_decode(ulaw_encode(ALL_INT16)).astype(np.int32)
    da = alaw_decode(alaw_encode(ALL_INT16)).astype(np.int32)
    x = ALL_INT16.astype(np.int32)
    # interior error <= half the top-segment step; the clip region
    # (|x| > peak) errs by at most |int16 min| - peak
    assert np.abs(du - x).max() <= 32768 - 32124
    assert np.abs(da - x).max() <= 32768 - 32256
    # no sign flips (near-zero values may quantize to exactly 0)
    assert (du.astype(np.int64) * x >= 0).all()
    assert (da.astype(np.int64) * x >= 0).all()


def test_decode_monotonic_per_sign():
    # positive µ-law codes descend 0xFF -> 0x80 as magnitude grows
    pos = ulaw_decode(np.arange(0xFF, 0x7F, -1, dtype=np.uint8))
    assert (np.diff(pos.astype(np.int32)) > 0).all()
    neg = ulaw_decode(np.arange(0x00, 0x80, dtype=np.uint8))
    assert (np.diff(neg.astype(np.int32)) > 0).all()
    # A-law: sort all decoded values; each code appears once (bijection)
    vals = alaw_decode(ALL_CODES)
    assert len(np.unique(vals)) == 256


@pytest.mark.parametrize("companding", ["alaw", "ulaw"])
def test_g711_wav_roundtrip(companding):
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, (800, 2), dtype=np.int16)
    payload = wav_encode(x, sample_rate=8000, companding=companding)
    out, rate = wav_decode(payload)
    assert rate == 8000 and out.dtype == np.int16 and out.shape == x.shape
    dec = (alaw_decode if companding == "alaw" else ulaw_decode)
    enc = (alaw_encode if companding == "alaw" else ulaw_encode)
    assert (out == dec(enc(x))).all()  # exactly the companded samples


def test_float_wav_roundtrip_and_features():
    rng = np.random.default_rng(1)
    for dtype in (np.float32, np.float64):
        x = (rng.random((1500, 1)) * 2 - 1).astype(dtype)
        out, _ = wav_decode(wav_encode(x))
        assert out.dtype == dtype and (out == x).all()
    # float twin of an int16 signal featurizes identically when the float
    # samples are exactly x/32768
    xi = rng.integers(-32768, 32768, 2000, dtype=np.int16)
    xf = (xi.astype(np.float64) / 32768.0)
    fi = audio_frame_features(wav_encode(xi), 4, 6)
    ff = audio_frame_features(wav_encode(xf), 4, 6)
    assert (fi == ff).all()


def test_g711_wav_through_dispatch():
    from spdb_spark.functions.multimodal import decode_features_status

    rng = np.random.default_rng(2)
    x = rng.integers(-20000, 20000, 1000, dtype=np.int16)
    feats, status = decode_features_status(
        wav_encode(x, companding="ulaw"), 3, 4
    )
    assert status == "ok" and feats.shape == (3, 4)
    # companding is lossy but close: RMS within 1% of the linear twin
    lin, _ = decode_features_status(wav_encode(x), 3, 4)
    assert np.allclose(feats[:, 0], lin[:, 0], rtol=0.01)
