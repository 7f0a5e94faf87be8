"""Dependency-free Netpbm codec (P4 bitmap / P5 graymap / P6 pixmap,
binary forms): the interchange format scientific and ML datasets still
ship. Built from the public Netpbm format description: ASCII header
(magic, whitespace-separated width/height[/maxval], '#' comments ending
at newline), one binary raster; P4 rows pad to whole bytes MSB-first;
maxval > 255 means big-endian 16-bit samples. Extends the real-decode
multimodal surface."""

from __future__ import annotations

import numpy as np

from spdb_spark.functions.limits import check_pixel_budget

PNM_MAGICS = (b"P4", b"P5", b"P6")


def _header_tokens(payload: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Parse n_tokens ASCII integers after the magic, skipping whitespace
    and '#' comments; -> (values, offset of the raster)."""
    vals: list[int] = []
    i = 2
    n = len(payload)
    while len(vals) < n_tokens:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i] == 0x23:  # '#' comment to end of line
            while i < n and payload[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("pnm: malformed header")
        vals.append(int(payload[i:j]))
        i = j
    if i >= n or not payload[i : i + 1].isspace():
        raise ValueError("pnm: missing raster separator")
    return vals, i + 1  # exactly ONE whitespace byte precedes the raster


def pnm_decode(payload: bytes) -> np.ndarray:
    """-> (H,W) gray uint8/uint16 (P4 maps 1->0, 0->255: Netpbm '1' is
    black) or (H,W,3) RGB uint8/uint16."""
    magic = payload[:2]
    if magic not in PNM_MAGICS:
        raise ValueError("not a binary PNM payload")
    if magic == b"P4":
        (w, h), off = _header_tokens(payload, 2)
        maxval, channels = 1, 1
    else:
        (w, h, maxval), off = _header_tokens(payload, 3)
        channels = 3 if magic == b"P6" else 1
    if w <= 0 or h <= 0 or not (1 <= maxval < 65536):
        raise ValueError("pnm: bad dimensions or maxval")
    check_pixel_budget(w, h, "pnm")

    if magic == b"P4":
        stride = (w + 7) // 8
        raw = payload[off : off + stride * h]
        if len(raw) < stride * h:
            raise ValueError("pnm: raster truncated")
        bits = np.unpackbits(
            np.frombuffer(raw, np.uint8).reshape(h, stride), axis=1
        )[:, :w]
        return ((1 - bits) * 255).astype(np.uint8)

    unit = 2 if maxval > 255 else 1
    need = w * h * channels * unit
    raw = payload[off : off + need]
    if len(raw) < need:
        raise ValueError("pnm: raster truncated")
    dt = np.dtype(">u2") if unit == 2 else np.uint8
    arr = np.frombuffer(raw, dt).reshape(h, w, channels)
    arr = arr.astype(np.uint16) if unit == 2 else arr.copy()
    return arr[:, :, 0] if channels == 1 else arr


def pnm_encode(img: np.ndarray) -> bytes:
    """Gray (H,W) uint8/uint16 -> P5; RGB (H,W,3) uint8/uint16 -> P6."""
    if img.ndim == 2:
        magic, channels = b"P5", 1
    elif img.ndim == 3 and img.shape[2] == 3:
        magic, channels = b"P6", 3
    else:
        raise ValueError("pnm encode expects (H,W) or (H,W,3)")
    if img.dtype == np.uint8:
        maxval, body = 255, img.tobytes()
    elif img.dtype == np.uint16:
        maxval, body = 65535, img.astype(">u2").tobytes()
    else:
        raise ValueError("pnm encode expects uint8/uint16")
    h, w = img.shape[:2]
    return magic + f"\n{w} {h}\n{maxval}\n".encode() + body
