"""FLAC codec tests.

Anchors: the CRC-8/CRC-16 implementations are pinned to the public check
values for their polynomials (so frame checksums follow the spec, not a
self-consistent variant), and decode paths the encoder never emits (LPC,
wasted bits, Rice2, escaped and multi-partition residuals) are driven by
hand-assembled frames whose expected samples are computed by hand from
the spec recurrences.
"""

import struct

import numpy as np
import pytest

from spdb_spark.functions.flac import (
    _BitWriter,
    _utf8_code,
    crc8,
    crc16,
    flac_decode,
    flac_encode,
    flac_frame_features,
)


def test_crc_check_values():
    # CRC-8 poly 0x07 init 0 (SMBUS) and CRC-16 poly 0x8005 init 0
    # (UMTS/BUYPASS): public check values over "123456789".
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def test_mono_int16_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.integers(-32768, 32768, 3000, dtype=np.int16)
    out, rate = flac_decode(flac_encode(x, sample_rate=22050))
    assert rate == 22050
    assert out.dtype == np.int16 and out.shape == (3000, 1)
    assert (out[:, 0] == x).all()


def test_multi_frame_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, (1000, 2), dtype=np.int16)
    out, _ = flac_decode(flac_encode(x, blocksize=192))
    assert (out == x).all()


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_decorrelation_roundtrip(mode):
    rng = np.random.default_rng(2)
    base = rng.integers(-30000, 30000, 800, dtype=np.int16)
    # correlated channels, where decorrelation modes differ from identity
    x = np.stack([base, base + rng.integers(-500, 500, 800)], axis=1)
    x = x.clip(-32768, 32767).astype(np.int16)
    out, _ = flac_decode(flac_encode(x, channel_mode=mode))
    assert (out == x).all()


def test_uint8_roundtrip_matches_wav_convention():
    rng = np.random.default_rng(3)
    u = rng.integers(0, 256, 500, dtype=np.uint8)
    out, _ = flac_decode(flac_encode(u))
    assert out.dtype == np.int8
    assert (out[:, 0].astype(np.int16) == u.astype(np.int16) - 128).all()


def test_constant_signal_compresses_to_constant_subframe():
    x = np.full(4096, -1234, np.int16)
    payload = flac_encode(x)
    assert len(payload) < 120  # CONSTANT subframe: one value, not 4096
    out, _ = flac_decode(payload)
    assert (out[:, 0] == x).all()


def test_corruption_detected():
    x = np.arange(-500, 500, dtype=np.int16)
    payload = bytearray(flac_encode(x))
    payload[-10] ^= 0x40  # flip a bit inside the last frame
    with pytest.raises(ValueError, match="CRC|MD5|sync|truncated"):
        flac_decode(bytes(payload))


def test_features_match_wav_twin():
    from spdb_spark.functions.audio import audio_frame_features, wav_encode

    rng = np.random.default_rng(4)
    for dtype in (np.int16, np.uint8):
        if dtype is np.int16:
            x = rng.integers(-32768, 32768, 2000, dtype=np.int16)
        else:
            x = rng.integers(0, 256, 2000, dtype=np.uint8)
        via_wav = audio_frame_features(wav_encode(x), 4, 6)
        via_flac = flac_frame_features(flac_encode(x), 4, 6)
        assert (via_wav == via_flac).all()


def test_dispatch_routes_flac():
    from spdb_spark.functions.multimodal import decode_features_status

    x = np.arange(-1000, 1000, dtype=np.int16)
    feats, status = decode_features_status(flac_encode(x), 3, 4)
    assert status == "ok" and feats.shape == (3, 4)


# ---------------------------------------------------------------------------
# Hand-assembled frames for decoder paths the encoder never writes
# ---------------------------------------------------------------------------


def _stream(bs: int, write_subframe, nch: int = 1, bps: int = 16) -> bytes:
    """Assemble a one-frame FLAC stream; write_subframe(w) writes the
    subframe bits for each channel."""
    si = _BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(bs, 36)
    info = si.bytes() + b"\x00" * 16  # MD5 unset => decoder skips the check

    w = _BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(0b0111, 4)
    w.write(0b0000, 4)
    w.write(nch - 1, 4)
    w.write(0b100, 3)  # 16-bit
    w.write(0, 1)
    for b in _utf8_code(0):
        w.write(b, 8)
    w.write(bs - 1, 16)
    w.write(crc8(bytes(w.buf)), 8)
    for _ in range(nch):
        write_subframe(w)
    w.align()
    frame = bytes(w.buf)

    return (
        b"fLaC"
        + bytes([0x80])
        + struct.pack(">I", len(info))[1:]
        + info
        + frame
        + struct.pack(">H", crc16(frame))
    )


def _write_rice0(w: _BitWriter, resid, param):
    w.write(0, 2)  # method 0 (4-bit rice)
    w.write(0, 4)  # partition order 0
    w.write(param, 4)
    for r in resid:
        u = (r << 1) if r >= 0 else (-(r << 1) - 1)
        w.write_unary(u >> param)
        if param:
            w.write(u & ((1 << param) - 1), param)


def test_lpc_subframe_hand_assembled():
    # Order-2 LPC, coefs [2,-1], shift 0 == fixed order 2: x[i] =
    # 2x[i-1] - x[i-2] + e[i]. Warmup [10, 13], residuals [1, -2, 3].
    def sub(w):
        w.write(0, 1)
        w.write(0b100000 | (2 - 1), 6)  # LPC order 2
        w.write(0, 1)
        w.write(10, 16)
        w.write(13, 16)
        w.write(15 - 1, 4)  # precision 15
        w.write(0, 5)  # shift 0
        w.write(2, 15)
        w.write(-1 & 0x7FFF, 15)
        _write_rice0(w, [1, -2, 3], 2)

    out, _ = flac_decode(_stream(5, sub))
    # x2 = 2*13-10+1 = 17; x3 = 2*17-13-2 = 19; x4 = 2*19-17+3 = 24
    assert out[:, 0].tolist() == [10, 13, 17, 19, 24]


def test_lpc_shift_hand_assembled():
    # Order-1 LPC, coef [3], shift 1: pred = (3*prev) >> 1.
    def sub(w):
        w.write(0, 1)
        w.write(0b100000, 6)  # LPC order 1
        w.write(0, 1)
        w.write(7, 16)
        w.write(4 - 1, 4)  # precision 4
        w.write(1, 5)  # shift 1
        w.write(3, 4)
        _write_rice0(w, [0, -1], 1)

    out, _ = flac_decode(_stream(3, sub))
    # x1 = (21>>1)+0 = 10; x2 = (30>>1)-1 = 14
    assert out[:, 0].tolist() == [7, 10, 14]


def test_wasted_bits_hand_assembled():
    # CONSTANT subframe, 2 wasted bits: stored value 300 at 14 bits
    # decodes to 300 << 2 = 1200.
    def sub(w):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(1, 1)  # wasted-bits flag
        w.write(1, 2)  # unary 1 => k = 2 wasted bits
        w.write(300, 14)

    out, _ = flac_decode(_stream(4, sub))
    assert out[:, 0].tolist() == [1200] * 4


def test_rice2_and_escape_partitions_hand_assembled():
    # VERBATIM-equivalent via residuals: fixed order 0, method 1 (rice2,
    # 5-bit params), partition order 1 => two partitions of 2: first
    # rice-coded with param 3, second ESCAPED to 6-bit raw.
    def sub(w):
        w.write(0, 1)
        w.write(0b001000, 6)  # FIXED order 0
        w.write(0, 1)
        w.write(1, 2)  # method 1
        w.write(1, 4)  # partition order 1
        w.write(3, 5)  # partition 1: rice2 param 3
        for r in (5, -4):
            u = (r << 1) if r >= 0 else (-(r << 1) - 1)
            w.write_unary(u >> 3)
            w.write(u & 7, 3)
        w.write(0x1F, 5)  # partition 2: escape
        w.write(6, 5)  # 6 raw bits per sample
        w.write(-17 & 0x3F, 6)
        w.write(23, 6)

    out, _ = flac_decode(_stream(4, sub))
    assert out[:, 0].tolist() == [5, -4, -17, 23]
