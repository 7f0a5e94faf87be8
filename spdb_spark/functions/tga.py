"""Dependency-free Truevision TGA codec (the Targa format, from the
public TGA 2.0 specification). TGA is the no-compression interchange
format game and VFX pipelines still emit; decoding it extends the
real-decode multimodal surface.

Layout: 18-byte little-endian header (id length, colormap type, image
type, colormap spec, origin, width/height, pixel depth, descriptor),
optional image-id field, optional colormap, raster. Pixels are BGR(A);
16-bit is A1R5G5B5. Image types: 1/2/3 uncompressed colormapped/
truecolor/gray, 9/10/11 their RLE twins (per-packet: high bit set =
run of count+1 copies of one pixel, clear = count+1 literal pixels;
packets never span the image end but may span rows). Descriptor bit 5
= top-to-bottom rows (default bottom-up), bit 4 = right-to-left.

TGA has NO leading magic; detection uses the TGA 2.0 footer (26 bytes
at EOF ending in ``TRUEVISION-XFILE.\\0``), which `tga_encode` always
writes. Footerless TGA 1.0 files decode fine when called directly but
are not auto-sniffed (documented, like other weak-magic formats here).

Scale posture: uncompressed rasters decode as one vectorized
frombuffer/reshape; RLE walks per PACKET (not per pixel). Stateless per
payload -> decode parallelism is scan parallelism; dimensions are
budget-checked before any allocation.
"""

from __future__ import annotations

import struct

import numpy as np

from spdb_spark.functions.limits import check_pixel_budget

TGA_FOOTER_SIG = b"TRUEVISION-XFILE.\x00"


def tga_sniff(payload: bytes) -> bool:
    """True when the payload carries the TGA 2.0 footer signature."""
    return len(payload) >= 44 and payload.endswith(TGA_FOOTER_SIG)


def _unpack_pixels(raw: np.ndarray, depth: int, n: int) -> np.ndarray:
    """(n*bytes,) uint8 raster -> (n, C) uint8 channels in output order
    (gray | RGB | RGBA); 16-bit expands A1R5G5B5 with 5->8-bit scaling."""
    if depth == 8:
        return raw.reshape(n, 1)
    if depth == 16:
        v = raw.reshape(n, 2).astype(np.uint16)
        v = v[:, 0] | (v[:, 1] << 8)
        out = np.empty((n, 4), np.uint8)
        # 5-bit -> 8-bit: (x*255 + 15) // 31 == round(x*255/31)
        for i, sh in enumerate((10, 5, 0)):  # R, G, B fields
            c = ((v >> sh) & 0x1F).astype(np.uint32)
            out[:, i] = ((c * 255 + 15) // 31).astype(np.uint8)
        out[:, 3] = np.where(v >> 15, 255, 0).astype(np.uint8)
        return out
    if depth == 24:
        bgr = raw.reshape(n, 3)
        return bgr[:, ::-1]
    if depth == 32:
        bgra = raw.reshape(n, 4)
        return bgra[:, [2, 1, 0, 3]]
    raise ValueError(f"tga: unsupported pixel depth {depth}")


def _decode_rle(data: bytes, off: int, n_px: int, unit: int) -> np.ndarray:
    """RLE raster -> (n_px*unit,) uint8; walks per packet."""
    out = np.empty(n_px * unit, np.uint8)
    filled = 0
    n = len(data)
    while filled < n_px:
        if off >= n:
            raise ValueError("tga: RLE stream truncated")
        head = data[off]
        off += 1
        count = (head & 0x7F) + 1
        if filled + count > n_px:
            raise ValueError("tga: RLE overflows image")
        if head & 0x80:  # run packet: one pixel value, count copies
            if off + unit > n:
                raise ValueError("tga: RLE stream truncated")
            px = np.frombuffer(data, np.uint8, unit, off)
            off += unit
            out[filled * unit : (filled + count) * unit] = np.tile(px, count)
        else:  # raw packet: count literal pixels
            nb = count * unit
            if off + nb > n:
                raise ValueError("tga: RLE stream truncated")
            out[filled * unit : filled * unit + nb] = np.frombuffer(
                data, np.uint8, nb, off
            )
            off += nb
        filled += count
    return out


def tga_decode(payload: bytes) -> np.ndarray:
    """-> (H,W) gray, (H,W,3) RGB, or (H,W,4) RGBA uint8."""
    if len(payload) < 18:
        raise ValueError("not a TGA payload")
    (
        id_len,
        cmap_type,
        img_type,
        cmap_first,
        cmap_len,
        cmap_depth,
        _x0,
        _y0,
        w,
        h,
        depth,
        desc,
    ) = struct.unpack("<BBBHHBHHHHBB", payload[:18])
    if img_type not in (1, 2, 3, 9, 10, 11) or cmap_type not in (0, 1):
        raise ValueError(f"tga: unsupported image type {img_type}")
    if w <= 0 or h <= 0:
        raise ValueError("tga: bad dimensions")
    check_pixel_budget(w, h, "tga")

    off = 18 + id_len
    cmap = None
    if cmap_type == 1:
        if cmap_depth not in (24, 32):
            raise ValueError(f"tga: unsupported colormap depth {cmap_depth}")
        nb = cmap_len * (cmap_depth // 8)
        if off + nb > len(payload):
            raise ValueError("tga: colormap truncated")
        entries = np.frombuffer(payload, np.uint8, nb, off)
        cmap = _unpack_pixels(entries, cmap_depth, cmap_len)
        off += nb

    n_px = w * h
    unit = depth // 8
    if depth not in (8, 16, 24, 32):
        raise ValueError(f"tga: unsupported pixel depth {depth}")
    if img_type >= 9:
        raster = _decode_rle(payload, off, n_px, unit)
    else:
        nb = n_px * unit
        if off + nb > len(payload):
            raise ValueError("tga: raster truncated")
        raster = np.frombuffer(payload, np.uint8, nb, off)

    if img_type in (1, 9):  # colormapped: 8-bit indices into the map
        if cmap is None or depth != 8:
            raise ValueError("tga: colormapped image without usable colormap")
        idx = raster.astype(np.int64) - cmap_first
        if idx.min() < 0 or idx.max() >= cmap.shape[0]:
            raise ValueError("tga: colormap index out of range")
        px = cmap[idx]
    else:
        px = _unpack_pixels(raster, depth, n_px)
        if img_type in (3, 11) and px.shape[1] != 1:
            raise ValueError("tga: gray image with non-8-bit depth")

    img = px.reshape(h, w, px.shape[1])
    if not desc & 0x20:  # default order is bottom-up
        img = img[::-1]
    if desc & 0x10:  # right-to-left
        img = img[:, ::-1]
    img = np.ascontiguousarray(img)
    return img[:, :, 0] if img.shape[2] == 1 else img


def _rle_pack(row_bytes: np.ndarray, n_px: int, unit: int) -> bytearray:
    """Greedy RLE for one image: runs >= 2 become run packets, the rest
    accumulate into raw packets; both capped at 128 pixels."""
    px = row_bytes.reshape(n_px, unit)
    out = bytearray()
    i = 0
    while i < n_px:
        # measure the run at i
        j = i + 1
        while j < n_px and j - i < 128 and (px[j] == px[i]).all():
            j += 1
        if j - i >= 2:
            out.append(0x80 | (j - i - 1))
            out += px[i].tobytes()
            i = j
            continue
        # literal stretch: until the next run of >= 2 or 128 px
        j = i + 1
        while (
            j < n_px
            and j - i < 128
            and not (j + 1 < n_px and (px[j + 1] == px[j]).all())
        ):
            j += 1
        out.append(j - i - 1)
        out += px[i:j].tobytes()
        i = j
    return out


def tga_encode(img: np.ndarray, rle: bool = False) -> bytes:
    """Gray (H,W) -> type 3/11; RGB (H,W,3) / RGBA (H,W,4) -> type 2/10
    (BGR(A), top-to-bottom). Always appends the TGA 2.0 footer so the
    output is sniffable."""
    if img.dtype != np.uint8:
        raise ValueError("tga encode expects uint8")
    if img.ndim == 2:
        img_type, depth, body = 3, 8, img
    elif img.ndim == 3 and img.shape[2] == 3:
        img_type, depth, body = 2, 24, img[:, :, ::-1]
    elif img.ndim == 3 and img.shape[2] == 4:
        img_type, depth, body = 2, 32, img[:, :, [2, 1, 0, 3]]
    else:
        raise ValueError("tga encode expects (H,W), (H,W,3) or (H,W,4)")
    h, w = img.shape[:2]
    flat = np.ascontiguousarray(body).reshape(-1)
    if rle:
        img_type += 8
        raster = bytes(_rle_pack(flat, w * h, depth // 8))
    else:
        raster = flat.tobytes()
    # alpha depth 8 for 32-bit; bit 5 set = top-to-bottom row order
    desc = (8 if depth == 32 else 0) | 0x20
    header = struct.pack(
        "<BBBHHBHHHHBB", 0, 0, img_type, 0, 0, 0, 0, 0, w, h, depth, desc
    )
    footer = struct.pack("<II", 0, 0) + TGA_FOOTER_SIG
    return header + raster + footer
