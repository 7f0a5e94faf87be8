"""Dependency-free ICO (Windows icon) codec.

An ICO is a directory of images, each either a PNG stream or a headerless
DIB whose BITMAPINFOHEADER declares DOUBLE height (pixel XOR mask stacked
over a 1-bit AND transparency mask). Decode picks the largest entry and
reuses the sibling codecs: PNG members go through operators/render.
png_decode, DIB members through the BMP row machinery with the AND mask
applied as binary alpha. Encode wraps one image as a single-entry
PNG-member ICO (the modern form every browser emits for favicons).

Built from the public ICO/CUR file layout (ICONDIR + ICONDIRENTRY) and
the BMP DIB structure already implemented in functions/bmp.py.
"""

from __future__ import annotations

import struct

import numpy as np

from spdb_spark.functions.limits import check_pixel_budget

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def ico_entries(payload: bytes) -> list[tuple[int, int, int, int]]:
    """-> [(width, height, offset, size)] per directory entry (0 in the
    header byte means 256 per the format)."""
    if len(payload) < 6 or payload[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO payload")
    (count,) = struct.unpack_from("<H", payload, 4)
    if count == 0:
        raise ValueError("ico: empty directory")
    out = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(payload):
            raise ValueError("ico: directory truncated")
        w, h = payload[off], payload[off + 1]
        size, img_off = struct.unpack_from("<II", payload, off + 8)
        if img_off + size > len(payload):
            raise ValueError("ico: image data out of range")
        out.append((w or 256, h or 256, img_off, size))
    return out


def _decode_dib_member(blob: bytes) -> np.ndarray:
    """Headerless DIB icon member: BITMAPINFOHEADER with doubled height,
    pixel rows, then the 1-bit AND mask. Returns RGBA."""
    from spdb_spark.functions.bmp import bmp_decode

    if len(blob) < 40:
        raise ValueError("ico: DIB member truncated")
    hdr_size, w, h2 = struct.unpack_from("<Iii", blob, 0)
    bpp = struct.unpack_from("<H", blob, 14)[0]
    n_colors = struct.unpack_from("<I", blob, 32)[0]
    if hdr_size != 40 or h2 % 2:
        raise ValueError("ico: unsupported DIB header")
    h = h2 // 2
    check_pixel_budget(w, h, "ico")
    if bpp == 8 and not n_colors:
        n_colors = 256
    # biClrUsed may carry an optimization color table even for bpp > 8 —
    # it must be SKIPPED or the pixel rows shift by its length
    palette_len = 4 * n_colors
    xor_stride = (w * bpp // 8 + 3) & ~3
    and_stride = ((w + 7) // 8 + 3) & ~3
    xor_end = 40 + palette_len + xor_stride * h

    # rebuild a single-height BMP around the XOR mask and reuse bmp_decode
    offset = 14 + 40 + palette_len
    bmp = (
        b"BM" + struct.pack("<IHHI", offset + xor_stride * h, 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, xor_stride * h,
                      0, 0, n_colors, 0)
        + blob[40:xor_end]
    )
    img = bmp_decode(bmp)
    if img.ndim == 2:
        rgba = np.empty((h, w, 4), np.uint8)
        rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = img
        rgba[..., 3] = 255
        img = rgba
    elif img.shape[2] == 3:
        rgba = np.empty((h, w, 4), np.uint8)
        rgba[..., :3] = img
        rgba[..., 3] = 255
        img = rgba
    else:
        img = img.copy()

    mask_bytes = blob[xor_end : xor_end + and_stride * h]
    if len(mask_bytes) == and_stride * h and bpp != 32:
        # AND mask: 1 = transparent. 32bpp icons carry real alpha and
        # conventionally ignore the mask.
        bits = np.unpackbits(
            np.frombuffer(mask_bytes, np.uint8).reshape(h, and_stride), axis=1
        )[:, :w]
        img[bits[::-1] == 1, 3] = 0  # mask rows are bottom-up like the DIB
    return img


def ico_decode(payload: bytes) -> np.ndarray:
    """Decode the LARGEST image in the icon directory. PNG members return
    whatever png_decode returns; DIB members return RGBA."""
    from spdb_spark.operators.render import png_decode

    entries = ico_entries(payload)
    w, h, off, size = max(entries, key=lambda e: e[0] * e[1])
    blob = payload[off : off + size]
    if blob[:8] == _PNG_SIG:
        return png_decode(blob)
    return _decode_dib_member(blob)


def ico_encode(img: np.ndarray) -> bytes:
    """Encode one image as a single-entry PNG-member ICO (lossless; the
    same inputs png_encode accepts, up to 256x256 per the format)."""
    from spdb_spark.operators.render import png_encode

    h, w = img.shape[:2]
    if w > 256 or h > 256:
        raise ValueError("ico: entries are at most 256x256")
    member = png_encode(img)
    entry = struct.pack(
        "<BBBBHHII", w % 256, h % 256, 0, 0, 1,
        32 if img.ndim == 3 else 8, len(member), 6 + 16,
    )
    return b"\x00\x00\x01\x00\x01\x00" + entry + member
