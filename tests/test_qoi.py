"""QOI codec tests: encode/decode round-trips across op mixes,
hand-assembled spec fixtures independent of the encoder, corrupt-stream
rejection, bomb refusal, and dispatch/probe/resize integration."""

import struct

import numpy as np
import pytest

from spdb_spark.functions.limits import PixelBudgetError
from spdb_spark.functions.qoi import qoi_decode, qoi_encode

_END = b"\x00" * 7 + b"\x01"


def _hdr(w: int, h: int, channels: int = 3) -> bytes:
    return b"qoif" + struct.pack(">II", w, h) + bytes((channels, 0))


def test_roundtrip_op_mixes():
    rng = np.random.default_rng(11)
    cases = [
        rng.integers(0, 256, (13, 17, 3), np.uint8),  # RGB: all ops
        rng.integers(0, 256, (9, 5, 4), np.uint8),  # RGBA op
        np.full((8, 8, 3), 200, np.uint8),  # long runs (>62 pixels)
        np.tile(np.arange(64, dtype=np.uint8), (4, 1)),  # gray: DIFF/LUMA
        rng.integers(0, 4, (32, 32, 4), np.uint8) * 60,  # INDEX reuse
        np.zeros((1, 1, 3), np.uint8),  # single pixel == start state prev
    ]
    for img in cases:
        want = np.repeat(img[:, :, None], 3, axis=2) if img.ndim == 2 else img
        got = qoi_decode(qoi_encode(img))
        assert got.shape == want.shape and (got == want).all()


def test_hand_assembled_ops():
    """Each op pinned from the spec, independent of the encoder."""
    # RGB op then RUN of 1: 2x1 both (10,20,30)
    s = _hdr(2, 1) + bytes((0xFE, 10, 20, 30, 0xC0)) + _END
    d = qoi_decode(s)
    assert d.shape == (1, 2, 3) and (d == [10, 20, 30]).all()

    # DIFF from start state (0,0,0): dr=+1, dg=0, db=-2 -> (1,0,254)
    s = _hdr(1, 1) + bytes((0x40 | (3 << 4) | (2 << 2) | 0,)) + _END
    assert (qoi_decode(s)[0, 0] == [1, 0, 254]).all()

    # LUMA from start: dg=+5 (0x80|37), dr-dg=-8 (0x0), db-dg=+7 (0xF)
    s = _hdr(1, 1) + bytes((0x80 | 37, 0x0F)) + _END
    assert (qoi_decode(s)[0, 0] == [(5 - 8) & 0xFF, 5, 5 + 7]).all()

    # INDEX: write (10,20,30), return to start-state hash slot, re-fetch
    ih = (10 * 3 + 20 * 5 + 30 * 7 + 255 * 11) % 64
    s = _hdr(3, 1, 4) + bytes((0xFF, 10, 20, 30, 255, 0xFE, 9, 9, 9, ih)) + _END
    d = qoi_decode(s)
    assert (d[0, 0] == [10, 20, 30, 255]).all()
    assert (d[0, 2] == [10, 20, 30, 255]).all()


def test_corrupt_streams_raise():
    with pytest.raises(ValueError):
        qoi_decode(b"qoi?" + b"\x00" * 20)
    with pytest.raises(ValueError):  # truncated: 4 pixels declared, 1 op
        qoi_decode(_hdr(2, 2) + bytes((0xFE, 1, 2, 3)) + _END)
    with pytest.raises(ValueError):  # run overflows the pixel count
        qoi_decode(_hdr(2, 1) + bytes((0xFE, 1, 2, 3, 0xC2)) + _END)
    with pytest.raises(ValueError):  # end marker corrupted
        qoi_decode(_hdr(1, 1) + bytes((0xFE, 1, 2, 3)) + b"\x00" * 7 + b"\x02")
    with pytest.raises(ValueError):  # zero dimensions
        qoi_decode(_hdr(0, 4) + _END)


def test_header_bomb_refused():
    with pytest.raises(PixelBudgetError):
        qoi_decode(_hdr(1 << 16, 1 << 16) + bytes((0xC0,)) + _END)


def test_dispatch_probe_resize():
    from spdb_spark.functions.multimodal import (
        decode_features_status,
        resize_image_array,
    )
    from spdb_spark.functions.probe import probe_payload
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (24, 20, 3), np.uint8)
    payload = qoi_encode(img)

    feats, status = decode_features_status(payload, 3, 5)
    assert status == "ok"
    via_png, st2 = decode_features_status(png_encode(img), 3, 5)
    assert st2 == "ok" and (feats == via_png).all()

    container, f = probe_payload(payload)
    assert container == "qoi" and (f["width"], f["height"]) == (20, 24)
    assert f["codec"] == "qoi/rgb" and f["n_frames"] == 1

    # truncated stream falls to the stub, never an exception
    _, st3 = decode_features_status(payload[:20], 3, 5)
    assert st3 == "stub"

    # real resize: decoded resized bytes match resizing the array
    small = qoi_decode(qoi_encode(resize_image_array(img, 8, 6)))
    assert (small == resize_image_array(img, 8, 6)).all()


def test_resize_kernel_real_for_qoi(spark):
    from spdb_spark.functions.multimodal import resize_images

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (10, 10, 4), np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(qoi_encode(img)))], "media_id long, payload binary"
    )
    row = resize_images(media, 4, 4).collect()[0]
    assert row["status"] == "ok"
    out = qoi_decode(bytes(row["payload"]))
    assert out.shape == (4, 4, 4)
