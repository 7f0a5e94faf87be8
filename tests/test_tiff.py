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
    with pytest.raises(ValueError, match="budget"):
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


# --- round-2 surface: tiled layout + planar configuration 2 ---------------


def _hand_tiled_gray() -> tuple[bytes, np.ndarray]:
    """4x3 gray8, 2x2 tiles, assembled field-by-field from TIFF 6.0 §15:
    tiles run left-to-right then top-to-bottom; bottom edge tiles carry
    padding rows that must be cropped, not rendered."""
    img = np.arange(1, 13, dtype=np.uint8).reshape(3, 4)
    tiles = [
        bytes([1, 2, 5, 6]), bytes([3, 4, 7, 8]),
        bytes([9, 10, 0, 0]), bytes([11, 12, 0, 0]),
    ]
    entries = [
        (256, 3, 1, 4), (257, 3, 1, 3), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 1), (277, 3, 1, 1), (322, 4, 1, 2), (323, 4, 1, 2),
        (324, 4, 4, "offs"), (325, 4, 4, "cnts"),
    ]
    ifd_off = 8
    heap_off = ifd_off + 2 + 12 * len(entries) + 4
    data_off = heap_off + 32  # two 4-LONG arrays
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", len(entries))
    for tag, typ, cnt, val in entries:
        if val == "offs":
            val = heap_off
        elif val == "cnts":
            val = heap_off + 16
        if typ == 3 and cnt == 1:
            out += struct.pack("<HHIHH", tag, typ, cnt, val, 0)
        else:
            out += struct.pack("<HHII", tag, typ, cnt, val)
    out += struct.pack("<I", 0)
    out += struct.pack("<4I", *(data_off + 4 * i for i in range(4)))
    out += struct.pack("<4I", 4, 4, 4, 4)
    for t in tiles:
        out += t
    return bytes(out), img


def test_hand_assembled_tiled_gray():
    payload, img = _hand_tiled_gray()
    out = tiff_decode(payload)
    assert out.shape == (3, 4) and (out == img).all()


def test_tiled_roundtrips():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (37, 51), dtype=np.uint8)
    for kwargs in (
        {"tile": (16, 16)},
        {"tile": (16, 16), "compression": "packbits"},
        {"tile": (32, 16), "compression": "lzw", "predictor": True},
        {"tile": (64, 64)},  # single tile, all padding on two edges
    ):
        out = tiff_decode(tiff_encode(img, **kwargs))
        assert out.shape == img.shape and (out == img).all(), kwargs
    rgb = rng.integers(0, 256, (20, 19, 3), dtype=np.uint8)
    assert (tiff_decode(tiff_encode(rgb, tile=(16, 16), compression="lzw")) == rgb).all()
    g16 = rng.integers(0, 65536, (18, 23), dtype=np.uint16)
    assert (tiff_decode(tiff_encode(g16, tile=(16, 16))) == g16).all()


def test_planar_roundtrips():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (21, 13, 3), dtype=np.uint8)
    for kwargs in (
        {"planar": True},
        {"planar": True, "rows_per_strip": 5},
        {"planar": True, "compression": "lzw", "predictor": True},
        {"planar": True, "compression": "packbits", "rows_per_strip": 4},
    ):
        out = tiff_decode(tiff_encode(rgb, **kwargs))
        assert out.shape == rgb.shape and (out == rgb).all(), kwargs
    rgba = rng.integers(0, 256, (9, 16, 4), dtype=np.uint8)
    assert (tiff_decode(tiff_encode(rgba, planar=True, rows_per_strip=3)) == rgba).all()
    # planar + tiled combined
    assert (
        tiff_decode(tiff_encode(rgb, planar=True, tile=(16, 16), compression="lzw"))
        == rgb
    ).all()


def test_planar_matches_chunky_decode():
    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 256, (14, 14, 3), dtype=np.uint8)
    a = tiff_decode(tiff_encode(rgb, planar=True))
    b = tiff_decode(tiff_encode(rgb))
    assert (a == b).all()


def test_tile_grid_amplification_refused():
    # w*h passes the budget, but a hostile TileWidth/TileLength pads the
    # grid to ~10^10 pixels: must refuse before allocating
    payload = bytearray(tiff_encode(np.zeros((4, 4), np.uint8), tile=(16, 16)))
    # tags: 256,257,258,259,262,277,322,323,324,325 -> 322 is entry idx 6
    struct.pack_into("<I", payload, 8 + 2 + 12 * 6 + 8, 100_000)
    struct.pack_into("<I", payload, 8 + 2 + 12 * 7 + 8, 100_000)
    with pytest.raises(ValueError, match="pixel budget"):
        tiff_decode(bytes(payload))


def test_incomplete_tiles_raise():
    payload = bytearray(tiff_encode(np.zeros((40, 40), np.uint8), tile=(16, 16)))
    # shrink the declared tile count arrays by claiming a bigger image
    struct.pack_into("<H", payload, 8 + 2 + 12 * 0 + 8, 200)
    with pytest.raises(ValueError, match="incomplete"):
        tiff_decode(bytes(payload))


# --- round-3 surface: multi-page IFD chains -------------------------------

from spdb_spark.functions.tiff import tiff_encode_pages, tiff_pages  # noqa: E402


def test_multipage_roundtrip_mixed_options():
    rng = np.random.default_rng(9)
    pages = [rng.integers(0, 256, (10 + i, 12), dtype=np.uint8) for i in range(4)]
    for opts in ({}, {"compression": "lzw"}, {"tile": (16, 16)}):
        payload = tiff_encode_pages(pages, **opts)
        got = tiff_pages(payload)
        assert len(got) == 4
        for g, p in zip(got, pages):
            assert g.shape == p.shape and (g == p).all(), opts
    # first page == tiff_decode (single-page API unchanged)
    assert (tiff_decode(tiff_encode_pages(pages)) == pages[0]).all()


def test_multipage_features_sample_pages():
    from spdb_spark.functions.multimodal import decode_features_status
    from spdb_spark.functions.tiff import tiff_frame_features

    rng = np.random.default_rng(10)
    pages = [rng.integers(0, 256, (8, 8), dtype=np.uint8) for _ in range(5)]
    payload = tiff_encode_pages(pages)
    feats, st = decode_features_status(payload, 3, 4)
    assert st == "ok"
    assert (feats == tiff_frame_features(payload, 3, 4)).all()
    # single page still featurizes like its PNG twin
    from spdb_spark.operators.render import png_encode

    one = tiff_encode_pages(pages[:1])
    a, _ = decode_features_status(one, 3, 4)
    b, _ = decode_features_status(png_encode(pages[0]), 3, 4)
    assert (a == b).all()


def test_multipage_probe_and_cycle_safety():
    from spdb_spark.functions.probe import probe_payload

    pages = [np.zeros((6, 6), np.uint8)] * 3
    payload = tiff_encode_pages(pages)
    container, meta = probe_payload(payload)
    assert container == "tiff" and meta["n_frames"] == 3
    # craft a next-IFD pointer cycle: point the last IFD back at the first
    data = bytearray(payload)
    (first_ifd,) = struct.unpack_from("<I", data, 4)
    (count,) = struct.unpack_from("<H", data, first_ifd)
    # walk to the last IFD
    off = first_ifd
    while True:
        (c,) = struct.unpack_from("<H", data, off)
        nxt_pos = off + 2 + 12 * c
        (nxt,) = struct.unpack_from("<I", data, nxt_pos)
        if nxt == 0:
            break
        off = nxt
    struct.pack_into("<I", data, nxt_pos, first_ifd)  # cycle!
    _, meta = probe_payload(bytes(data))
    assert meta["n_frames"] == 3  # cycle stops, no hang
    assert len(tiff_pages(bytes(data))) == 3


def test_multipage_budget_is_cumulative():
    from spdb_spark.functions.limits import PixelBudgetError

    # each page is fine alone; 40 x 2048^2 = 168M > 2^27 cumulative
    pages = [np.zeros((2048, 2048), np.uint8)] * 40
    payload = tiff_encode_pages(pages)
    with pytest.raises(PixelBudgetError):
        tiff_pages(payload)
