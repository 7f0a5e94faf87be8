"""TIFF codec tests.

Anchors: PackBits is pinned to the TIFF 6.0 spec's own worked example
(section 9), and a big-endian (MM) gray fixture plus a palette fixture
are hand-assembled byte-by-byte from the spec's IFD layout — independent
of the encoder, so a self-consistent-but-wrong container walk cannot
pass. TIFF-LZW's "early change" is exercised across the 511/1023/2047
width boundaries and the 4096 table reset by high-entropy inputs.
"""

import struct

import numpy as np
import pytest

from spdb_spark.functions.tiff import (
    packbits_decode,
    packbits_encode,
    tiff_decode,
    tiff_encode,
    tiff_lzw_decode,
    tiff_lzw_encode,
)

# TIFF 6.0 section 9 worked example.
_PB_UNPACKED = bytes.fromhex("aaaaaa80002aaaaaaaaa80002a22" + "aa" * 10)
_PB_PACKED = bytes.fromhex("feaa0280002afdaa0380002a22f7aa")


def test_packbits_spec_example():
    assert packbits_decode(_PB_PACKED, 24) == _PB_UNPACKED
    # our encoder reproduces the spec's packing exactly on this input
    assert packbits_encode(_PB_UNPACKED) == _PB_PACKED


def test_packbits_roundtrip_random():
    rng = np.random.default_rng(0)
    for n in (1, 2, 3, 200, 5000):
        # low-entropy bytes produce runs AND literals
        data = (rng.integers(0, 3, n, dtype=np.uint8) * 100).tobytes()
        assert packbits_decode(packbits_encode(data), n) == data


def test_lzw_roundtrip_crosses_early_change_boundaries():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 30_000, dtype=np.uint8).tobytes()
    assert tiff_lzw_decode(tiff_lzw_encode(data), len(data)) == data
    runs = (rng.integers(0, 2, 30_000, dtype=np.uint8) * 255).tobytes()
    assert tiff_lzw_decode(tiff_lzw_encode(runs), len(runs)) == runs


def _hand_mm_gray() -> tuple[bytes, np.ndarray]:
    """2x2 big-endian gray8 uncompressed TIFF, assembled field-by-field."""
    img = np.array([[10, 200], [30, 40]], np.uint8)
    entries = [
        (256, 3, 1, 2),      # width SHORT 2
        (257, 3, 1, 2),      # length SHORT 2
        (258, 3, 1, 8),      # bits per sample
        (259, 3, 1, 1),      # no compression
        (262, 3, 1, 1),      # BlackIsZero
        (273, 4, 1, None),   # strip offset (patched)
        (277, 3, 1, 1),
        (278, 4, 1, 2),
        (279, 4, 1, 4),
    ]
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * len(entries) + 4
    out = bytearray(b"MM\x00*" + struct.pack(">I", ifd_off))
    out += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        if val is None:
            val = data_off
        if typ == 3:  # SHORT packs into the first two value bytes
            out += struct.pack(">HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack(">HHII", tag, typ, cnt, val)
    out += struct.pack(">I", 0)
    out += img.tobytes()
    return bytes(out), img


def test_hand_assembled_big_endian_gray():
    payload, img = _hand_mm_gray()
    out = tiff_decode(payload)
    assert out.dtype == np.uint8 and (out == img).all()


def test_hand_assembled_palette():
    """Palette-color: 1x2 image, indices [0,1], ColorMap with 16-bit
    entries (value >> 8 is the 8-bit channel) laid out R* G* B*."""
    img_bytes = bytes([0, 1])
    # ColorMap: R = [0x1100, 0x2200], G = [0x3300, 0x4400], B = [0x5500, 0x6600]
    cmap = struct.pack("<6H", 0x1100, 0x2200, 0x3300, 0x4400, 0x5500, 0x6600)
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 1), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3),  # palette photometric
        (273, 4, 1, None), (277, 3, 1, 1), (278, 4, 1, 1), (279, 4, 1, 2),
        (320, 3, 6, "heap"),
    ]
    ifd_off = 8
    heap_off = ifd_off + 2 + 12 * len(entries) + 4
    data_off = heap_off + len(cmap)
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if val is None:
            val = data_off
        if val == "heap":
            val = heap_off
        if typ == 3 and cnt == 1:
            out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += cmap + img_bytes
    got = tiff_decode(bytes(out))
    assert got.shape == (1, 2, 3)
    assert got[0, 0].tolist() == [0x11, 0x33, 0x55]
    assert got[0, 1].tolist() == [0x22, 0x44, 0x66]


@pytest.mark.parametrize("compression", ["none", "packbits", "lzw"])
def test_gray_roundtrip(compression):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (33, 29), dtype=np.uint8)
    out = tiff_decode(tiff_encode(img, compression=compression))
    assert out.dtype == np.uint8 and (out == img).all()


def test_gray16_rgb_rgba_roundtrip():
    rng = np.random.default_rng(3)
    g16 = rng.integers(0, 65536, (9, 7), dtype=np.uint16)
    out = tiff_decode(tiff_encode(g16, compression="lzw"))
    assert out.dtype == np.uint16 and (out == g16).all()
    rgb = rng.integers(0, 256, (11, 5, 3), dtype=np.uint8)
    assert (tiff_decode(tiff_encode(rgb, compression="packbits")) == rgb).all()
    rgba = rng.integers(0, 256, (6, 8, 4), dtype=np.uint8)
    assert (tiff_decode(tiff_encode(rgba)) == rgba).all()


def test_multi_strip_and_predictor():
    rng = np.random.default_rng(4)
    # smooth gradient: the predictor really changes the byte stream
    img = (np.cumsum(rng.integers(0, 3, (40, 50), dtype=np.uint8), axis=1)
           % 256).astype(np.uint8)
    for kwargs in (
        {"rows_per_strip": 7},
        {"compression": "lzw", "predictor": True},
        {"compression": "lzw", "predictor": True, "rows_per_strip": 16},
        {"compression": "packbits", "rows_per_strip": 1},
    ):
        out = tiff_decode(tiff_encode(img, **kwargs))
        assert (out == img).all(), kwargs
    rgb = rng.integers(0, 4, (12, 9, 3), dtype=np.uint8)
    out = tiff_decode(tiff_encode(rgb, compression="lzw", predictor=True))
    assert (out == rgb).all()


def test_unsupported_variants_raise_and_stub():
    from spdb_spark.functions.multimodal import decode_features_status

    img = np.zeros((4, 4), np.uint8)
    payload = bytearray(tiff_encode(img))
    # flip Compression (tag 259) to 7 (JPEG-in-TIFF): entry 4 value
    struct.pack_into("<H", payload, 8 + 2 + 12 * 3 + 8, 7)
    with pytest.raises(ValueError, match="compression"):
        tiff_decode(bytes(payload))
    _f, status = decode_features_status(bytes(payload), 2, 3)
    assert status == "stub"
    # allocation bomb refused before allocating
    bomb = bytearray(tiff_encode(img))
    struct.pack_into("<I", bomb, 8 + 2 + 12 * 0 + 8, 2_000_000)
    struct.pack_into("<I", bomb, 8 + 2 + 12 * 1 + 8, 2_000_000)
    with pytest.raises(ValueError, match="pixel budget"):
        decode_features_status(bytes(bomb), 2, 3)


def test_dispatch_feature_identity_and_resize():
    from spdb_spark.functions.multimodal import (
        decode_features_status,
        resize_image_array,
    )
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
    via_tif, st = decode_features_status(tiff_encode(img, compression="lzw"), 3, 5)
    via_png, _ = decode_features_status(png_encode(img), 3, 5)
    assert st == "ok" and (via_tif == via_png).all()
    resized = resize_image_array(tiff_decode(tiff_encode(img)), 12, 12)
    assert (resized == img[::2, ::2]).all()
