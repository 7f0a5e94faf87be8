"""Full-web PNG decode tests: all five scanline filters, every color
type, sub-byte depths, palette + tRNS, gray+alpha, and Adam7 interlace.

Fixtures are assembled by an independent test-side forward filterer
(applying the spec's filter DEFINITIONS, not the decoder's inverse), so
the unfilter logic is anchored to the spec rather than to itself.
"""

import struct
import zlib

import numpy as np
import pytest

from spdb_spark.operators.render import png_decode, png_encode

SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def _forward_filter(rows: np.ndarray, bpp: int, ftype: int) -> bytes:
    """Apply the SPEC's forward filter to raw scanlines (rows: (h, stride)
    uint8): Filt(x) = Orig(x) - predictor(Orig neighbors)."""
    h, stride = rows.shape
    out = bytearray()
    prev = np.zeros(stride, np.int32)
    for r in range(h):
        cur = rows[r].astype(np.int32)
        a = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) if bpp <= stride else np.zeros(stride, np.int32)
        b = prev
        c = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]]) if bpp <= stride else np.zeros(stride, np.int32)
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - a
        elif ftype == 2:
            filt = cur - b
        elif ftype == 3:
            filt = cur - ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
            filt = cur - pred
        out.append(ftype)
        out += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def _png(w, h, depth, ctype, idat_raw, extra=b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(idat_raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_gray(ftype):
    rng = np.random.default_rng(ftype)
    img = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    raw = _forward_filter(img, 1, ftype)
    assert (png_decode(_png(17, 13, 8, 0, raw)) == img).all()


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_each_filter_rgba_and_rgb(ftype):
    rng = np.random.default_rng(10 + ftype)
    rgba = rng.integers(0, 256, (9, 7, 4), dtype=np.uint8)
    raw = _forward_filter(rgba.reshape(9, 28), 4, ftype)
    assert (png_decode(_png(7, 9, 8, 6, raw)) == rgba).all()
    rgb = rng.integers(0, 256, (6, 11, 3), dtype=np.uint8)
    raw = _forward_filter(rgb.reshape(6, 33), 3, ftype)
    assert (png_decode(_png(11, 6, 8, 2, raw)) == rgb).all()


def test_mixed_filters_per_row():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (5, 8), dtype=np.uint8)
    # rows 1+ reference the previous RECONSTRUCTED row: filter each row
    # against a helper row holding the real predecessor, then drop it
    raw = bytearray()
    prev = np.zeros(8, np.int32)
    for r in range(5):
        two = np.vstack([prev.astype(np.uint8), img[r]])
        raw += _forward_filter(two, 1, r % 5)[1 + 8 :]  # drop the helper row
        prev = img[r].astype(np.int32)
    assert (png_decode(_png(8, 5, 8, 0, bytes(raw))) == img).all()


def test_16bit_filtered():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 65536, (6, 5), dtype=np.uint16)
    rows = img.astype(">u2").view(np.uint8).reshape(6, 10)
    raw = _forward_filter(rows, 2, 4)
    out = png_decode(_png(5, 6, 16, 0, raw))
    assert out.dtype == np.uint16 and (out == img).all()


def test_palette_with_and_without_trns():
    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (7, 9), dtype=np.uint8)
    raw = _forward_filter(idx, 1, 1)
    plte = _chunk(b"PLTE", pal.tobytes())
    out = png_decode(_png(9, 7, 8, 3, raw, extra=plte))
    assert out.shape == (7, 9, 3) and (out == pal[idx]).all()
    trns = _chunk(b"tRNS", bytes([255, 0, 128]))
    out = png_decode(_png(9, 7, 8, 3, raw, extra=plte + trns))
    assert out.shape == (7, 9, 4)
    assert (out[..., :3] == pal[idx]).all()
    expect_a = np.array([255, 0, 128, 255, 255], np.uint8)
    assert (out[..., 3] == expect_a[idx]).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_sub_byte_gray_depths(depth):
    rng = np.random.default_rng(depth)
    maxv = (1 << depth) - 1
    img = rng.integers(0, maxv + 1, (5, 11), dtype=np.uint8)
    # pack scanlines MSB-first
    stride = (11 * depth + 7) // 8
    rows = np.zeros((5, stride), np.uint8)
    for r in range(5):
        bits = []
        for v in img[r]:
            bits.extend((v >> (depth - 1 - k)) & 1 for k in range(depth))
        bits += [0] * (stride * 8 - len(bits))
        rows[r] = np.packbits(np.array(bits, np.uint8))
    raw = _forward_filter(rows, 1, 0)
    out = png_decode(_png(11, 5, depth, 0, raw))
    assert (out == (img.astype(np.uint16) * 255 // maxv).astype(np.uint8)).all()


def test_sub_byte_palette():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 1]], np.uint8)
    rows = np.zeros((2, 2), np.uint8)  # 5 px * 2 bits = 10 bits -> 2 bytes
    for r in range(2):
        bits = []
        for v in idx[r]:
            bits.extend(((v >> 1) & 1, v & 1))
        bits += [0] * (16 - len(bits))
        rows[r] = np.packbits(np.array(bits, np.uint8))
    raw = _forward_filter(rows, 1, 0)
    plte = _chunk(b"PLTE", pal.tobytes())
    out = png_decode(_png(5, 2, 2, 3, raw, extra=plte))
    assert (out == pal[idx]).all()


def test_gray_alpha():
    rng = np.random.default_rng(6)
    ga = rng.integers(0, 256, (8, 6, 2), dtype=np.uint8)
    raw = _forward_filter(ga.reshape(8, 12), 2, 4)
    out = png_decode(_png(6, 8, 8, 4, raw))
    assert out.shape == (8, 6, 4)
    assert (out[..., 0] == ga[..., 0]).all()
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    assert (out[..., 3] == ga[..., 1]).all()


def test_adam7_interlace():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (10, 13), dtype=np.uint8)
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 1, 2), (0, 1, 1, 1))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        raw += _forward_filter(sub, 1, 4)  # Paeth inside each pass
    ihdr = struct.pack(">IIBBBBB", 13, 10, 8, 0, 0, 0, 1)
    payload = (SIG + _chunk(b"IHDR", ihdr)
               + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b""))
    assert (png_decode(payload) == img).all()


def test_rgb_encode_roundtrip_and_resize_path():
    from spdb_spark.functions.multimodal import resize_image_array

    rng = np.random.default_rng(8)
    rgb = rng.integers(0, 256, (14, 10, 3), dtype=np.uint8)
    assert (png_decode(png_encode(rgb)) == rgb).all()
    resized = resize_image_array(png_decode(png_encode(rgb)), 5, 7)
    assert (png_decode(png_encode(resized)) == rgb[::2, ::2]).all()


def test_existing_streams_still_decode():
    rng = np.random.default_rng(9)
    g8 = rng.integers(0, 256, (12, 12), dtype=np.uint8)
    g16 = rng.integers(0, 65536, (6, 6), dtype=np.uint16)
    rgba = rng.integers(0, 256, (5, 5, 4), dtype=np.uint8)
    for img in (g8, g16, rgba):
        out = png_decode(png_encode(img))
        assert out.dtype == img.dtype and (out == img).all()
