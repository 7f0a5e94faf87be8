"""Dependency-free BMP (Windows DIB) codec: 8-bit palettized, 24-bit BGR,
and 32-bit BGRA uncompressed images, bottom-up and top-down row order.

Built from the public BMP file structure (BITMAPFILEHEADER +
BITMAPINFOHEADER, rows padded to 4-byte boundaries, positive height =
bottom-up storage). No reference-repo counterpart (jhuapl-boss/spdb
renders PNG only); extends the real-decode multimodal surface. Encode is
lossless: gray uint8 writes an 8-bit gray-palette DIB, (H,W,3) RGB writes
24-bit, (H,W,4) RGBA writes 32-bit.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"

_BI_RGB = 0


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
    offset = 14 + 40 + len(palette)
    header = (
        BMP_MAGIC
        + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bpp, _BI_RGB, len(body), 2835, 2835,
            256 if bpp == 8 else 0, 0,
        )
    )
    return header + palette + bytes(body)


def bmp_decode(payload: bytes) -> np.ndarray:
    """-> (H,W) gray uint8 (8-bit with an all-gray palette), (H,W,4) RGBA
    (8-bit color palette or 32-bit), or (H,W,3) RGB (24-bit)."""
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
    if compression != _BI_RGB:
        raise ValueError(f"BMP: compression {compression} unsupported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP: {bpp} bpp unsupported")
    if w <= 0 or h_raw == 0:
        raise ValueError("BMP: bad dimensions")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw

    stride = (w * (bpp // 8) + 3) & ~3
    if offset + stride * h > len(payload):
        raise ValueError("BMP: pixel data truncated")
    data = np.frombuffer(
        payload[offset : offset + stride * h], np.uint8
    ).reshape(h, stride)
    if not top_down:
        data = data[::-1]

    if bpp == 8:
        if not n_colors:
            n_colors = 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_colors], np.uint8
        ).reshape(n_colors, 4)
        idx = data[:, :w]
        if idx.max(initial=0) >= n_colors:
            raise ValueError("BMP: palette index out of range")
        b, g, r = pal[:, 0], pal[:, 1], pal[:, 2]
        if (b == g).all() and (g == r).all():
            return r[idx]  # gray palette -> 2-D grayscale
        out = np.empty((h, w, 4), np.uint8)
        out[..., 0], out[..., 1], out[..., 2] = r[idx], g[idx], b[idx]
        out[..., 3] = 255
        return out
    px = data[:, : w * (bpp // 8)].reshape(h, w, bpp // 8)
    if bpp == 24:
        return px[..., ::-1].copy()  # BGR -> RGB
    return px[..., [2, 1, 0, 3]].copy()  # BGRA -> RGBA
