"""Dependency-free BMP (Windows DIB) codec.

Decode covers the real-web Windows-DIB surface: 1/4/8-bit palettized,
16-bit (555 default or BI_BITFIELDS masks), 24-bit BGR, 32-bit BGRA/
BI_BITFIELDS, plus the RLE8/RLE4 compressed forms — bottom-up and
top-down row order (RLE is bottom-up only, per the format). Encode is
lossless: gray uint8 writes an 8-bit gray-palette DIB, (H,W,3) RGB
writes 24-bit, (H,W,4) RGBA writes 32-bit; RLE8/RLE4 encoders exist for
round-trip coverage of the compressed decode paths.

Built from the public BMP file structure (BITMAPFILEHEADER +
BITMAPINFOHEADER/V4/V5, rows padded to 4-byte boundaries, positive
height = bottom-up storage, RLE escape codes 0/1/2 = EOL/EOF/delta and
>=3 = word-aligned absolute mode). No reference-repo counterpart
(jhuapl-boss/spdb renders PNG only); extends the real-decode multimodal
surface. Still unsupported (honest ValueError -> stub rows upstream):
OS/2 core headers, BI_JPEG/BI_PNG embedded streams.
"""

from __future__ import annotations

import struct

import numpy as np

from spdb_spark.functions.limits import check_pixel_budget

BMP_MAGIC = b"BM"

_BI_RGB = 0
_BI_RLE8 = 1
_BI_RLE4 = 2
_BI_BITFIELDS = 3


def bmp_encode(img: np.ndarray) -> bytes:
    """Encode gray (H,W), RGB (H,W,3) or RGBA (H,W,4) uint8 losslessly."""
    if img.dtype != np.uint8:
        raise ValueError("BMP encode requires uint8 pixels")
    if img.ndim == 2:
        h, w = img.shape
        bpp, palette = 8, b"".join(
            struct.pack("<BBBB", v, v, v, 0) for v in range(256)
        )
        rows = img
    elif img.ndim == 3 and img.shape[2] == 3:
        h, w = img.shape[:2]
        bpp, palette = 24, b""
        rows = img[..., ::-1]  # RGB -> BGR
    elif img.ndim == 3 and img.shape[2] == 4:
        h, w = img.shape[:2]
        bpp, palette = 32, b""
        rows = img[..., [2, 1, 0, 3]]  # RGBA -> BGRA
    else:
        raise ValueError("BMP encode expects (H,W), (H,W,3) or (H,W,4) uint8")

    stride = (w * (bpp // 8) + 3) & ~3
    body = bytearray()
    flat = rows.reshape(h, -1)
    pad = b"\x00" * (stride - flat.shape[1])
    for r in range(h - 1, -1, -1):  # bottom-up, the canonical order
        body += flat[r].tobytes() + pad
    return _assemble(w, h, bpp, _BI_RGB, palette, bytes(body))


def _assemble(
    w: int, h: int, bpp: int, compression: int, palette: bytes, body: bytes
) -> bytes:
    offset = 14 + 40 + len(palette)
    return (
        BMP_MAGIC
        + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, len(body),
            2835, 2835, len(palette) // 4, 0,
        )
        + palette
        + body
    )


def _gray_palette(n: int, step: int = 1) -> bytes:
    return b"".join(
        struct.pack("<BBBB", v * step, v * step, v * step, 0) for v in range(n)
    )


def _rle_row(row: np.ndarray, four_bit: bool) -> bytes:
    """One storage row as encoded runs (no absolute mode) + EOL."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        v = row[i]
        run = 1
        while i + run < n and run < 255 and row[i + run] == v:
            run += 1
        byte = (int(v) << 4) | int(v) if four_bit else int(v)
        out += bytes((run, byte))
        i += run
    out += b"\x00\x00"  # end of line
    return bytes(out)


def bmp_encode_rle8(img: np.ndarray) -> bytes:
    """Gray (H,W) uint8 -> RLE8-compressed gray-palette BMP."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("RLE8 encode expects (H,W) uint8")
    h, w = img.shape
    body = bytearray()
    for r in range(h - 1, -1, -1):  # RLE BMPs are bottom-up
        body += _rle_row(img[r], four_bit=False)
    body[-2:] = b"\x00\x01"  # last EOL becomes end-of-bitmap
    return _assemble(w, h, 8, _BI_RLE8, _gray_palette(256), bytes(body))


def bmp_encode_rle4(idx: np.ndarray) -> bytes:
    """Index (H,W) uint8 with values < 16 -> RLE4 BMP with the 17-step
    gray palette (index v decodes to gray v*17, so 15 -> 255)."""
    if idx.dtype != np.uint8 or idx.ndim != 2 or idx.max(initial=0) > 15:
        raise ValueError("RLE4 encode expects (H,W) uint8 with values < 16")
    h, w = idx.shape
    body = bytearray()
    for r in range(h - 1, -1, -1):
        body += _rle_row(idx[r], four_bit=True)
    body[-2:] = b"\x00\x01"
    return _assemble(w, h, 4, _BI_RLE4, _gray_palette(16, 17), bytes(body))


def _rle_decode(data: bytes, w: int, h: int, four_bit: bool) -> np.ndarray:
    """RLE8/RLE4 stream -> (H,W) palette indices, top-down.

    Storage is bottom-up (y counts storage rows from the bottom); delta
    escapes move +dx right / +dy toward the top of the image. Undefined
    (skipped) pixels decode to index 0, the common-renderer convention."""
    out = np.zeros((h, w), np.uint8)
    x = y = i = 0
    n = len(data)
    while True:
        if i + 2 > n:
            raise ValueError("BMP: RLE stream truncated")
        cnt, val = data[i], data[i + 1]
        i += 2
        if cnt > 0:  # encoded run
            if y >= h or x + cnt > w:
                raise ValueError("BMP: RLE run past row end")
            seg = out[y, x : x + cnt]
            if four_bit:
                seg[0::2] = val >> 4
                seg[1::2] = val & 0xF
            else:
                seg[:] = val
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
            if y > h:
                raise ValueError("BMP: RLE rows past image end")
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if i + 2 > n:
                raise ValueError("BMP: RLE delta truncated")
            x, y = x + data[i], y + data[i + 1]
            i += 2
            if x > w or y >= h:
                raise ValueError("BMP: RLE delta out of bounds")
        else:  # absolute mode: cnt=val literal pixels, word-aligned
            cnt = val
            if y >= h or x + cnt > w:
                raise ValueError("BMP: RLE absolute run past row end")
            nbytes = (cnt + 1) // 2 if four_bit else cnt
            nbytes += nbytes & 1  # pad to 16-bit boundary
            if i + nbytes > n:
                raise ValueError("BMP: RLE absolute run truncated")
            chunk = np.frombuffer(data[i : i + nbytes], np.uint8)
            if four_bit:
                nib = np.empty(nbytes * 2, np.uint8)
                nib[0::2] = chunk >> 4
                nib[1::2] = chunk & 0xF
                out[y, x : x + cnt] = nib[:cnt]
            else:
                out[y, x : x + cnt] = chunk[:cnt]
            i += nbytes
            x += cnt
    return out[::-1]  # bottom-up storage -> top-down image


def _apply_palette(
    idx: np.ndarray, payload: bytes, hdr_size: int, n_colors: int, bpp: int
) -> np.ndarray:
    """Palette indices -> 2-D gray (all-gray palette) or (H,W,4) RGBA."""
    if not n_colors:
        n_colors = 1 << bpp
    pal_off = 14 + hdr_size
    pal = np.frombuffer(payload[pal_off : pal_off + 4 * n_colors], np.uint8)
    if len(pal) < 4 * n_colors:
        raise ValueError("BMP: palette truncated")
    pal = pal.reshape(n_colors, 4)
    if idx.max(initial=0) >= n_colors:
        raise ValueError("BMP: palette index out of range")
    b, g, r = pal[:, 0], pal[:, 1], pal[:, 2]
    if (b == g).all() and (g == r).all():
        return r[idx]  # gray palette -> 2-D grayscale
    h, w = idx.shape
    out = np.empty((h, w, 4), np.uint8)
    out[..., 0], out[..., 1], out[..., 2] = r[idx], g[idx], b[idx]
    out[..., 3] = 255
    return out


def _mask_channel(px: np.ndarray, mask: int) -> np.ndarray:
    """Extract one BI_BITFIELDS channel, scaled to 0..255 by round(v*255/max)."""
    shift = (mask & -mask).bit_length() - 1
    maxv = mask >> shift
    v = (px >> shift) & maxv
    return ((v.astype(np.uint32) * 255 + maxv // 2) // maxv).astype(np.uint8)


def bmp_decode(payload: bytes) -> np.ndarray:
    """-> (H,W) gray uint8 (palettized with an all-gray palette), (H,W,3)
    RGB (24-bit), or (H,W,4) RGBA (color palette, 16/32-bit, bitfields)."""
    if payload[:2] != BMP_MAGIC or len(payload) < 54:
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BMP: core-header (OS/2) variant unsupported")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    n_colors = struct.unpack_from("<I", payload, 46)[0]
    if compression not in (_BI_RGB, _BI_RLE8, _BI_RLE4, _BI_BITFIELDS):
        raise ValueError(f"BMP: compression {compression} unsupported")
    if w <= 0 or h_raw == 0:
        raise ValueError("BMP: bad dimensions")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    check_pixel_budget(w, h, "bmp")

    if compression in (_BI_RLE8, _BI_RLE4):
        want = 8 if compression == _BI_RLE8 else 4
        if bpp != want:
            raise ValueError(f"BMP: RLE{want} requires {want} bpp, got {bpp}")
        if top_down:
            raise ValueError("BMP: RLE images must be bottom-up")
        idx = _rle_decode(payload[offset:], w, h, compression == _BI_RLE4)
        return _apply_palette(idx, payload, hdr_size, n_colors, bpp)

    if compression == _BI_BITFIELDS:
        if bpp not in (16, 32):
            raise ValueError(f"BMP: BI_BITFIELDS requires 16/32 bpp, got {bpp}")
        # Masks: 3 DWORDs after a 40-byte header, or the same file offset
        # inside a V4/V5 header (which adds an alpha mask at +12).
        rm, gm, bm = struct.unpack_from("<III", payload, 54)
        am = struct.unpack_from("<I", payload, 66)[0] if hdr_size >= 56 else 0
        if not (rm and gm and bm):
            raise ValueError("BMP: zero bitfield mask")
    elif bpp == 16:
        rm, gm, bm, am = 0x7C00, 0x03E0, 0x001F, 0  # BI_RGB 16bpp default: 555
    else:
        rm = gm = bm = am = 0

    if bpp in (16, 32) and (rm or compression == _BI_BITFIELDS):
        unit = bpp // 8
        stride = (w * unit + 3) & ~3
        if offset + stride * h > len(payload):
            raise ValueError("BMP: pixel data truncated")
        rows = np.frombuffer(
            payload[offset : offset + stride * h], np.uint8
        ).reshape(h, stride)
        if not top_down:
            rows = rows[::-1]
        dt = np.dtype("<u2") if bpp == 16 else np.dtype("<u4")
        px = rows[:, : w * unit].copy().view(dt).reshape(h, w)
        out = np.empty((h, w, 4), np.uint8)
        out[..., 0] = _mask_channel(px, rm)
        out[..., 1] = _mask_channel(px, gm)
        out[..., 2] = _mask_channel(px, bm)
        out[..., 3] = _mask_channel(px, am) if am else 255
        return out

    if bpp in (1, 4):
        stride = ((w * bpp + 31) // 32) * 4
        if offset + stride * h > len(payload):
            raise ValueError("BMP: pixel data truncated")
        rows = np.frombuffer(
            payload[offset : offset + stride * h], np.uint8
        ).reshape(h, stride)
        if not top_down:
            rows = rows[::-1]
        if bpp == 1:
            idx = np.unpackbits(rows, axis=1)[:, :w]
        else:
            nib = np.empty((h, stride * 2), np.uint8)
            nib[:, 0::2] = rows >> 4
            nib[:, 1::2] = rows & 0xF
            idx = nib[:, :w]
        return _apply_palette(
            np.ascontiguousarray(idx), payload, hdr_size, n_colors, bpp
        )

    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP: {bpp} bpp unsupported")
    stride = (w * (bpp // 8) + 3) & ~3
    if offset + stride * h > len(payload):
        raise ValueError("BMP: pixel data truncated")
    data = np.frombuffer(
        payload[offset : offset + stride * h], np.uint8
    ).reshape(h, stride)
    if not top_down:
        data = data[::-1]

    if bpp == 8:
        return _apply_palette(
            np.ascontiguousarray(data[:, :w]), payload, hdr_size, n_colors, bpp
        )
    px = data[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    if bpp == 24:
        return px[..., ::-1].copy()  # BGR -> RGB
    return px[..., [2, 1, 0, 3]].copy()  # BGRA -> RGBA
