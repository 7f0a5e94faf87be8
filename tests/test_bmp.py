"""BMP codec tests: hand-assembled fixture anchored to the public DIB
layout (byte offsets computed from the spec, not from the encoder),
round-trips for all three depths, row order, padding, and dispatch."""

import struct

import numpy as np
import pytest

from spdb_spark.functions.bmp import bmp_decode, bmp_encode


def _hand_bmp_24(top_down: bool) -> tuple[bytes, np.ndarray]:
    """2x2 24-bit BMP assembled field-by-field: TL=red TR=green BL=blue
    BR=white. Stride for w=2 is 8 bytes (6 rounded up to 4-byte multiple)."""
    w, h = 2, 2
    rows_display = [
        [(255, 0, 0), (0, 255, 0)],  # display row 0 (top)
        [(0, 0, 255), (255, 255, 255)],
    ]
    order = rows_display if top_down else rows_display[::-1]
    body = b""
    for row in order:
        for r, g, b in row:
            body += bytes([b, g, r])
        body += b"\x00\x00"  # pad 6 -> 8
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 54)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, w, (-h if top_down else h), 1, 24, 0, len(body),
        0, 0, 0, 0,
    )
    return hdr + body, np.array(rows_display, np.uint8)


@pytest.mark.parametrize("top_down", [False, True])
def test_hand_assembled_24bit(top_down):
    payload, expected = _hand_bmp_24(top_down)
    out = bmp_decode(payload)
    assert out.shape == (2, 2, 3)
    assert (out == expected).all()


def test_gray_roundtrip_odd_width_padding():
    rng = np.random.default_rng(0)
    for w in (1, 2, 3, 5, 17):  # exercise every stride-padding residue
        img = rng.integers(0, 256, (7, w), dtype=np.uint8)
        out = bmp_decode(bmp_encode(img))
        assert out.shape == img.shape and (out == img).all()


def test_rgb_and_rgba_roundtrip():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (9, 11, 3), dtype=np.uint8)
    assert (bmp_decode(bmp_encode(rgb)) == rgb).all()
    rgba = rng.integers(0, 256, (6, 7, 4), dtype=np.uint8)
    assert (bmp_decode(bmp_encode(rgba)) == rgba).all()


def test_color_palette_decodes_rgba():
    # 8-bit BMP with a non-gray palette -> (H,W,4) RGBA.
    img = np.array([[0, 1], [1, 0]], np.uint8)
    payload = bytearray(bmp_encode(img))
    # overwrite palette entries 0/1 with colors (BGRA quads at offset 54)
    payload[54:58] = bytes([10, 20, 30, 0])   # idx0: B=10 G=20 R=30
    payload[58:62] = bytes([40, 50, 60, 0])   # idx1
    out = bmp_decode(bytes(payload))
    assert out.shape == (2, 2, 4)
    assert tuple(out[0, 0, :3]) == (30, 20, 10)
    assert tuple(out[0, 1, :3]) == (60, 50, 40)
    assert (out[..., 3] == 255).all()


def test_unsupported_variants_raise():
    img = np.zeros((4, 4), np.uint8)
    payload = bytearray(bmp_encode(img))
    rle = bytearray(payload)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        bmp_decode(bytes(rle))
    lowbpp = bytearray(payload)
    struct.pack_into("<H", lowbpp, 28, 4)
    with pytest.raises(ValueError, match="bpp"):
        bmp_decode(bytes(lowbpp))
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode(bytes(payload[:-8]))


def test_dispatch_and_feature_identity_with_png():
    from spdb_spark.functions.multimodal import decode_features_status
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    via_bmp, st = decode_features_status(bmp_encode(img), 3, 5)
    via_png, _ = decode_features_status(png_encode(img), 3, 5)
    assert st == "ok" and (via_bmp == via_png).all()
    # a BM-prefixed non-BMP payload falls to the stub, not an exception
    _, st2 = decode_features_status(b"BM garbage that is not a dib", 3, 5)
    assert st2 == "stub"


def test_resize_real_path():
    from spdb_spark.functions.multimodal import resize_image_array, resize_images

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    # direct kernel path (no Spark needed): decode->resize->encode
    resized = resize_image_array(bmp_decode(bmp_encode(img)), 8, 8)
    assert (bmp_decode(bmp_encode(resized)) == img[::2, ::2]).all()
