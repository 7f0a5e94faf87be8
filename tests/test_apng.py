"""APNG tests: round-trips through the repo encoder, hand-built
payloads pinning blend/dispose/sequence semantics independent of the
encoder, PNG-twin feature identity, dispatch, probe, and bombs."""

import struct
import zlib

import numpy as np
import pytest

from spdb_spark.functions.apng import (
    apng_encode,
    apng_frame_features,
    apng_frames,
    is_apng,
)
from spdb_spark.functions.limits import PixelBudgetError
from spdb_spark.operators.render import _png_chunk, _PNG_SIG, png_encode


def _rgba(g):
    out = np.empty((*np.asarray(g).shape, 4), np.uint8)
    out[..., 0] = out[..., 1] = out[..., 2] = g
    out[..., 3] = 255
    return out


def test_roundtrip_gray_and_rgba():
    rng = np.random.default_rng(0)
    gray = [rng.integers(0, 256, (9, 7), dtype=np.uint8) for _ in range(4)]
    got = apng_frames(apng_encode(gray))
    assert len(got) == 4
    for f, g in zip(got, gray):
        assert (f == _rgba(g)).all()
    rgba = [rng.integers(0, 256, (5, 6, 4), dtype=np.uint8) for _ in range(3)]
    got = apng_frames(apng_encode(rgba))
    assert all((f == g).all() for f, g in zip(got, rgba))


def test_plain_png_is_single_frame_and_not_apng():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = png_encode(img)
    assert not is_apng(payload)
    [frame] = apng_frames(payload)
    assert (frame == _rgba(img)).all()
    assert is_apng(apng_encode([img, img]))


def _hand_apng(fctl2, data2, n_frames=2):
    """Canvas 4x4 gray: frame 0 = all 100; frame 1 supplied by caller."""
    base = np.full((4, 4), 100, np.uint8)

    def raw(arr):
        return zlib.compress(
            b"".join(b"\x00" + arr[r].tobytes() for r in range(arr.shape[0]))
        )

    out = bytearray(_PNG_SIG)
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
    out += _png_chunk(b"acTL", struct.pack(">II", n_frames, 0))
    out += _png_chunk(
        b"fcTL",
        struct.pack(">IIIIIHHBB", 0, 4, 4, 0, 0, 10, 100, 0, 0),
    )
    out += _png_chunk(b"IDAT", raw(base))
    out += _png_chunk(b"fcTL", fctl2)
    out += _png_chunk(b"fdAT", struct.pack(">I", 2) + data2)
    out += _png_chunk(b"IEND", b"")
    return bytes(out), base


def _raw(arr):
    return zlib.compress(
        b"".join(b"\x00" + arr[r].tobytes() for r in range(arr.shape[0]))
    )


def test_hand_subrect_source_blend():
    # frame 1: 2x2 rect of 200 at offset (1,2) [x=1,y=2], SOURCE blend
    sub = np.full((2, 2), 200, np.uint8)
    fctl = struct.pack(">IIIIIHHBB", 1, 2, 2, 1, 2, 10, 100, 0, 0)
    payload, base = _hand_apng(fctl, _raw(sub))
    f0, f1 = apng_frames(payload)
    assert (f0 == _rgba(base)).all()
    want = base.copy()
    want[2:4, 1:3] = 200
    assert (f1 == _rgba(want)).all()


def test_hand_dispose_background_and_previous():
    # three frames: base, then a rect with dispose, then a no-op rect —
    # the third frame shows what dispose left behind
    def build(dispose):
        sub = np.full((2, 2), 200, np.uint8)
        tiny = np.full((1, 1), 50, np.uint8)
        out = bytearray(_PNG_SIG)
        out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0))
        out += _png_chunk(b"acTL", struct.pack(">II", 3, 0))
        out += _png_chunk(
            b"fcTL", struct.pack(">IIIIIHHBB", 0, 4, 4, 0, 0, 1, 10, 0, 0)
        )
        out += _png_chunk(b"IDAT", _raw(np.full((4, 4), 100, np.uint8)))
        out += _png_chunk(
            b"fcTL", struct.pack(">IIIIIHHBB", 1, 2, 2, 1, 1, 1, 10, dispose, 0)
        )
        out += _png_chunk(b"fdAT", struct.pack(">I", 2) + _raw(sub))
        out += _png_chunk(
            b"fcTL", struct.pack(">IIIIIHHBB", 3, 1, 1, 0, 0, 1, 10, 0, 0)
        )
        out += _png_chunk(b"fdAT", struct.pack(">I", 4) + _raw(tiny))
        out += _png_chunk(b"IEND", b"")
        return bytes(out)

    # dispose NONE: the 200-rect persists into frame 3
    f = apng_frames(build(0))[2]
    assert (f[1:3, 1:3, 0] == 200).all()
    # dispose BACKGROUND: rect cleared to transparent black
    f = apng_frames(build(1))[2]
    assert (f[1:3, 1:3] == 0).all()
    # dispose PREVIOUS: rect reverts to the base 100s
    f = apng_frames(build(2))[2]
    assert (f[1:3, 1:3, 0] == 100).all() and (f[1:3, 1:3, 3] == 255).all()


def test_over_blend_alpha_composite():
    # RGBA canvas; frame 2 is half-transparent red OVER opaque gray 100
    base = np.zeros((2, 2, 4), np.uint8)
    base[...] = (100, 100, 100, 255)
    red = np.zeros((2, 2, 4), np.uint8)
    red[...] = (255, 0, 0, 128)

    def raw4(a):
        return zlib.compress(
            b"".join(b"\x00" + a[r].tobytes() for r in range(a.shape[0]))
        )

    out = bytearray(_PNG_SIG)
    out += _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
    out += _png_chunk(b"acTL", struct.pack(">II", 2, 0))
    out += _png_chunk(b"fcTL", struct.pack(">IIIIIHHBB", 0, 2, 2, 0, 0, 1, 10, 0, 0))
    out += _png_chunk(b"IDAT", raw4(base))
    out += _png_chunk(b"fcTL", struct.pack(">IIIIIHHBB", 1, 2, 2, 0, 0, 1, 10, 0, 1))
    out += _png_chunk(b"fdAT", struct.pack(">I", 2) + raw4(red))
    out += _png_chunk(b"IEND", b"")
    f1 = apng_frames(bytes(out))[1]
    # src-over on opaque dst: out = round(src*a + dst*(1-a)), a = 128/255
    a = 128.0 / 255.0
    want_r = round(255 * a + 100 * (1 - a))
    want_g = round(0 * a + 100 * (1 - a))
    assert (f1[..., 0] == want_r).all() and (f1[..., 1] == want_g).all()
    assert (f1[..., 3] == 255).all()


def test_sequence_and_rect_validation():
    sub = np.full((2, 2), 1, np.uint8)
    bad_seq = struct.pack(">IIIIIHHBB", 5, 2, 2, 0, 0, 1, 10, 0, 0)
    payload, _ = _hand_apng(bad_seq, _raw(sub))
    with pytest.raises(ValueError, match="sequence"):
        apng_frames(payload)
    oob = struct.pack(">IIIIIHHBB", 1, 3, 3, 2, 2, 1, 10, 0, 0)  # 2+3 > 4
    payload, _ = _hand_apng(oob, _raw(np.full((3, 3), 1, np.uint8)))
    with pytest.raises(ValueError, match="rect"):
        apng_frames(payload)


def test_amplification_bomb_refused():
    # many frames x large canvas: cumulative budget, not per-frame
    img = np.zeros((2048, 2048), np.uint8)
    payload = apng_encode([img] * 40)  # 40 * 4.2M = 168M > 2^27
    with pytest.raises(PixelBudgetError):
        apng_frames(payload)


def test_dispatch_and_gif_twin_features():
    from spdb_spark.functions.gif import gif_encode_frames
    from spdb_spark.functions.multimodal import decode_features_status

    rng = np.random.default_rng(1)
    frames = [
        rng.choice(np.array([0, 120, 255], np.uint8), size=(16, 16))
        for _ in range(5)
    ]
    via_apng, st = decode_features_status(apng_encode(frames), 3, 4)
    assert st == "ok"
    via_gif, _ = decode_features_status(gif_encode_frames(frames), 3, 4)
    assert (via_apng == via_gif).all()  # same schedule, same composites
    # single-frame animation == still PNG twin, bit-for-bit
    still = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    a, st_a = decode_features_status(apng_encode([still]), 3, 5)
    p, _ = decode_features_status(png_encode(still), 3, 5)
    assert st_a == "ok" and (a == p).all()


def test_probe_reports_claimed_frames():
    from spdb_spark.functions.probe import probe_payload

    img = np.zeros((8, 8), np.uint8)
    container, meta = probe_payload(apng_encode([img] * 7))
    assert container == "png" and meta["codec"].startswith("png/gray8")
    assert meta["n_frames"] == 7
    assert probe_payload(png_encode(img))[1]["n_frames"] == 1
