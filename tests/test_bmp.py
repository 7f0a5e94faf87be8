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
    jpeg_in_bmp = bytearray(payload)
    struct.pack_into("<I", jpeg_in_bmp, 30, 4)  # BI_JPEG
    with pytest.raises(ValueError, match="compression"):
        bmp_decode(bytes(jpeg_in_bmp))
    os2 = bytearray(payload)
    struct.pack_into("<I", os2, 14, 12)  # BITMAPCOREHEADER size
    with pytest.raises(ValueError, match="OS/2"):
        bmp_decode(bytes(os2))
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


# --- round-2 surface: RLE8/RLE4, bitfields, 16bpp, 1/4-bit rows ----------

from spdb_spark.functions.bmp import (  # noqa: E402
    _assemble,
    _gray_palette,
    bmp_encode_rle4,
    bmp_encode_rle8,
)
from spdb_spark.functions.limits import PixelBudgetError  # noqa: E402


def test_rle8_roundtrip_runs_and_noise():
    rng = np.random.default_rng(4)
    runs = rng.choice(np.array([0, 7, 200], np.uint8), size=(13, 17))
    assert (bmp_decode(bmp_encode_rle8(runs)) == runs).all()
    noise = rng.integers(0, 256, (9, 300), dtype=np.uint8)  # runs > 255 wide
    assert (bmp_decode(bmp_encode_rle8(noise)) == noise).all()


def test_rle4_roundtrip_maps_through_17_step_palette():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 16, (11, 23), dtype=np.uint8)
    out = bmp_decode(bmp_encode_rle4(idx))
    assert out.shape == idx.shape and (out == idx * 17).all()


def test_rle8_hand_stream_absolute_delta_eol_eof():
    # 4x4, bottom-up storage. Row 0: run of 4x 0xAA. Row 1: absolute
    # [1,2,3] (padded to a word) then run 1x 0xBB. Delta (2,1) from the
    # start of row 2 jumps to (x=2, row 3), zero-filling the skipped
    # pixels; two 0xCC close the image, then end-of-bitmap.
    body = bytes(
        [0x04, 0xAA, 0x00, 0x00,
         0x00, 0x03, 0x01, 0x02, 0x03, 0x00, 0x01, 0xBB, 0x00, 0x00,
         0x00, 0x02, 0x02, 0x01, 0x02, 0xCC, 0x00, 0x01]
    )
    payload = _assemble(4, 4, 8, 1, _gray_palette(256), body)
    expected = np.array(
        [[0, 0, 0xCC, 0xCC],
         [0, 0, 0, 0],
         [0x01, 0x02, 0x03, 0xBB],
         [0xAA, 0xAA, 0xAA, 0xAA]], np.uint8
    )
    assert (bmp_decode(payload) == expected).all()


def test_rle_malformed_streams_raise():
    pal = _gray_palette(256)
    with pytest.raises(ValueError, match="truncated"):
        bmp_decode(_assemble(4, 4, 8, 1, pal, bytes([0x04, 0xAA])))
    with pytest.raises(ValueError, match="past row end"):
        bmp_decode(_assemble(4, 4, 8, 1, pal, bytes([0x05, 0xAA, 0x00, 0x01])))
    with pytest.raises(ValueError, match="delta out of bounds"):
        bmp_decode(
            _assemble(4, 4, 8, 1, pal, bytes([0x00, 0x02, 0x00, 0x09, 0x00, 0x01]))
        )
    # RLE must be bottom-up: negative height is malformed
    td = bytearray(_assemble(4, 4, 8, 1, pal, bytes([0x00, 0x01])))
    struct.pack_into("<i", td, 22, -4)
    with pytest.raises(ValueError, match="bottom-up"):
        bmp_decode(bytes(td))


def test_rle_header_bomb_hits_pixel_budget():
    # a ~1 KB payload declaring 60000x60000 must refuse before allocating
    payload = _assemble(60000, 60000, 8, 1, _gray_palette(256), b"\x00\x01")
    with pytest.raises(PixelBudgetError):
        bmp_decode(payload)


def test_16bpp_555_default_masks():
    # 2x2 bottom-up: TL=red TR=green BL=blue BR=white; stride 4 (no pad)
    rows_display = [[0x7C00, 0x03E0], [0x001F, 0x7FFF]]
    body = b"".join(
        struct.pack("<HH", *row) for row in rows_display[::-1]
    )
    payload = _assemble(2, 2, 16, 0, b"", body)
    out = bmp_decode(payload)
    assert out.shape == (2, 2, 4)
    assert tuple(out[0, 0]) == (255, 0, 0, 255)
    assert tuple(out[0, 1]) == (0, 255, 0, 255)
    assert tuple(out[1, 0]) == (0, 0, 255, 255)
    assert tuple(out[1, 1]) == (255, 255, 255, 255)


def test_16bpp_565_bitfields():
    # masks appended after a 40-byte header; pixel offset = 14+40+12+pal
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    body = struct.pack("<HH", 0xF800, 0x0841)  # red, then r=1 g=2 b=1
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + 12 + len(body), 0, 0, 66)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, 2, 1, 1, 16, 3, len(body), 0, 0, 0, 0
    )
    out = bmp_decode(hdr + masks + body)
    assert tuple(out[0, 0]) == (255, 0, 0, 255)
    # 5-bit 1 -> round(255/31)=8; 6-bit 2 -> round(2*255/63)=8
    assert tuple(out[0, 1]) == (8, 8, 8, 255)


def test_32bpp_bitfields_no_alpha_mask():
    masks = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    body = struct.pack("<II", 0x00123456, 0x00FFFFFF)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + 12 + len(body), 0, 0, 66)
    hdr += struct.pack(
        "<IiiHHIIiiII", 40, 2, 1, 1, 32, 3, len(body), 0, 0, 0, 0
    )
    out = bmp_decode(hdr + masks + body)
    assert tuple(out[0, 0]) == (0x12, 0x34, 0x56, 255)
    assert tuple(out[0, 1]) == (255, 255, 255, 255)


def test_1bit_and_4bit_rows():
    # 1-bit, 10 px wide, top-down, palette {0: black, 1: white}
    body = bytes([0xAA, 0x80, 0, 0, 0xFF, 0xC0, 0, 0])
    payload = _assemble(10, -2, 1, 0, _gray_palette(2, 255), body)
    out = bmp_decode(payload)
    assert out.shape == (2, 10)
    assert (out[0] == np.array([255, 0] * 5) ).all()
    assert (out[1] == 255).all()
    # 4-bit, 3 px wide: nibbles 1,2,3 then 15,0,4 via the 17-step palette
    body4 = bytes([0x12, 0x30, 0, 0, 0xF0, 0x40, 0, 0])
    out4 = bmp_decode(_assemble(3, -2, 4, 0, _gray_palette(16, 17), body4))
    assert (out4 == np.array([[17, 34, 51], [255, 0, 68]], np.uint8)).all()


def test_rle_dispatch_matches_uncompressed_features():
    from spdb_spark.functions.multimodal import decode_features_status

    rng = np.random.default_rng(6)
    img = rng.choice(np.array([0, 90, 255], np.uint8), size=(24, 24))
    via_rle, st = decode_features_status(bmp_encode_rle8(img), 3, 5)
    via_raw, _ = decode_features_status(bmp_encode(img), 3, 5)
    assert st == "ok" and (via_rle == via_raw).all()
