"""TGA codec tests: raw/RLE round-trips across depths, hand-assembled
fixtures independent of the encoder (bottom-up rows, right-to-left,
16-bit A1R5G5B5, colormapped raw + RLE with a first-entry offset),
corrupt-stream rejection, bomb refusal, footer-based sniffing, and
dispatch/probe/resize integration."""

import struct

import numpy as np
import pytest

from spdb_spark.functions.limits import PixelBudgetError
from spdb_spark.functions.tga import (
    TGA_FOOTER_SIG,
    tga_decode,
    tga_encode,
    tga_sniff,
)

_FOOTER = struct.pack("<II", 0, 0) + TGA_FOOTER_SIG


def _hdr(img_type, w, h, depth, desc=0, id_len=0, cmap=(0, 0, 0, 0)):
    cmap_type, first, length, cmap_depth = cmap
    return struct.pack(
        "<BBBHHBHHHHBB",
        id_len, cmap_type, img_type, first, length, cmap_depth,
        0, 0, w, h, depth, desc,
    )


def test_roundtrips_raw_and_rle():
    rng = np.random.default_rng(21)
    cases = [
        rng.integers(0, 256, (11, 7), np.uint8),
        rng.integers(0, 256, (6, 9, 3), np.uint8),
        rng.integers(0, 256, (5, 5, 4), np.uint8),
        np.full((16, 16, 3), 77, np.uint8),  # long runs (>128 px)
        rng.integers(0, 2, (4, 300, 3), np.uint8) * 255,  # run/raw mix
    ]
    for img in cases:
        for rle in (False, True):
            enc = tga_encode(img, rle=rle)
            assert tga_sniff(enc)
            got = tga_decode(enc)
            assert got.shape == img.shape and (got == img).all()


def test_bottom_up_and_right_to_left():
    # 2x2 type-2, rows stored bottom-up (desc bit5 clear), BGR order
    body = bytes([3, 2, 1, 6, 5, 4]) + bytes([9, 8, 7, 12, 11, 10])
    d = tga_decode(_hdr(2, 2, 2, 24) + body)
    assert (d[0] == [[7, 8, 9], [10, 11, 12]]).all()
    assert (d[1] == [[1, 2, 3], [4, 5, 6]]).all()
    # right-to-left (bit4) + top-to-bottom (bit5)
    d = tga_decode(_hdr(2, 2, 1, 8, desc=0x30) + bytes([1, 2]))
    assert (d == [[2, 1]]).all()


def test_16bit_555_with_attr_bit():
    v = (1 << 15) | (31 << 10) | (16 << 5) | 0  # A=1 R=31 G=16 B=0
    d = tga_decode(_hdr(2, 1, 1, 16, desc=0x20) + struct.pack("<H", v))
    assert d.shape == (1, 1, 4)
    assert tuple(d[0, 0]) == (255, round(16 * 255 / 31), 0, 255)


def test_colormapped_raw_and_rle_with_first_offset():
    # two 24-bit BGR entries, indices offset by first_entry=5
    cmap = bytes([10, 20, 30, 40, 50, 60])
    hdr = _hdr(1, 3, 1, 8, desc=0x20, cmap=(1, 5, 2, 24))
    d = tga_decode(hdr + cmap + bytes([5, 6, 5]))
    assert (d[0, 0] == [30, 20, 10]).all() and (d[0, 1] == [60, 50, 40]).all()
    # RLE twin: run of 2 idx6, raw 1 idx5
    hdr = _hdr(9, 3, 1, 8, desc=0x20, cmap=(1, 5, 2, 24))
    d = tga_decode(hdr + cmap + bytes((0x81, 6, 0x00, 5)))
    assert (d[0, 0] == [60, 50, 40]).all() and (d[0, 2] == [30, 20, 10]).all()
    # out-of-range index rejects
    with pytest.raises(ValueError):
        tga_decode(_hdr(1, 1, 1, 8, desc=0x20, cmap=(1, 5, 2, 24)) + cmap + b"\x09")


def test_corrupt_streams_raise():
    with pytest.raises(ValueError):  # truncated raw raster
        tga_decode(_hdr(2, 4, 4, 24) + b"\x00" * 10)
    with pytest.raises(ValueError):  # truncated RLE stream
        tga_decode(_hdr(10, 4, 4, 24) + bytes((0x8F,)))
    with pytest.raises(ValueError):  # RLE run overflowing the image
        tga_decode(_hdr(10, 2, 1, 8) + bytes((0x87, 1)))
    with pytest.raises(ValueError):  # unsupported depth
        tga_decode(_hdr(2, 2, 2, 12) + b"\x00" * 8)
    with pytest.raises(ValueError):  # unsupported image type
        tga_decode(_hdr(4, 2, 2, 24) + b"\x00" * 12)


def test_header_bomb_refused():
    with pytest.raises(PixelBudgetError):
        tga_decode(_hdr(2, 65535, 65535, 24))


def test_sniff_requires_footer():
    img = np.full((3, 3), 9, np.uint8)
    enc = tga_encode(img)
    assert tga_sniff(enc)
    footerless = enc[: -len(_FOOTER)]
    assert not tga_sniff(footerless)
    # direct decode still works without the footer (TGA 1.0)
    assert (tga_decode(footerless) == img).all()
    assert not tga_sniff(b"\x07" * 100)


def test_dispatch_probe_and_feature_identity_with_png():
    from spdb_spark.functions.multimodal import decode_features_status
    from spdb_spark.functions.probe import probe_payload
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, (18, 14, 3), np.uint8)
    payload = tga_encode(img, rle=True)

    feats, status = decode_features_status(payload, 3, 5)
    assert status == "ok"
    via_png, st2 = decode_features_status(png_encode(img), 3, 5)
    assert st2 == "ok" and (feats == via_png).all()

    container, f = probe_payload(payload)
    assert container == "tga" and (f["width"], f["height"]) == (14, 18)
    assert f["codec"] == "tga/10-24" and f["n_frames"] == 1

    # a payload that only LOOKS like TGA via the footer but has an
    # unsupported depth falls to the stub, never an exception
    bad = _hdr(2, 2, 2, 12) + b"\x00" * 8 + _FOOTER
    _, st3 = decode_features_status(bad, 3, 5)
    assert st3 == "stub"


def test_resize_kernel_real_for_tga(spark):
    from spdb_spark.functions.multimodal import resize_images

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (10, 12, 4), np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(tga_encode(img)))], "media_id long, payload binary"
    )
    row = resize_images(media, 5, 4).collect()[0]
    assert row["status"] == "ok"
    out = tga_decode(bytes(row["payload"]))
    assert out.shape == (4, 5, 4)
