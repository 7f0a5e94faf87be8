"""Dependency-free farbfeld codec (the suckless.org lossless image
interchange format — public spec). Trivial by design: 8-byte magic
``farbfeld``, width/height u32 big-endian, then row-major RGBA with
16 bits per channel, big-endian. Decode is one frombuffer/reshape, so
it runs at numpy speed; the format appears in minimalist tool pipelines
and dataset dumps."""

from __future__ import annotations

import struct

import numpy as np

from spdb_spark.functions.limits import check_pixel_budget

FARBFELD_MAGIC = b"farbfeld"


def farbfeld_decode(payload: bytes) -> np.ndarray:
    """-> (H,W,4) uint16 RGBA."""
    if payload[:8] != FARBFELD_MAGIC or len(payload) < 16:
        raise ValueError("not a farbfeld payload")
    w, h = struct.unpack(">II", payload[8:16])
    if w <= 0 or h <= 0:
        raise ValueError("farbfeld: bad dimensions")
    check_pixel_budget(w, h, "farbfeld")
    need = w * h * 8
    if len(payload) < 16 + need:
        raise ValueError("farbfeld: raster truncated")
    arr = np.frombuffer(payload, ">u2", w * h * 4, 16)
    return arr.reshape(h, w, 4).astype(np.uint16)


def farbfeld_encode(img: np.ndarray) -> bytes:
    """(H,W,4) uint16 RGBA, (H,W,4|3) uint8 (scaled x257 per the spec's
    8-bit convention), or (H,W) gray -> farbfeld bytes."""
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("farbfeld encode expects (H,W), (H,W,3) or (H,W,4)")
    if img.dtype == np.uint8:
        img = img.astype(np.uint16) * 257
    elif img.dtype != np.uint16:
        raise ValueError("farbfeld encode expects uint8/uint16")
    h, w = img.shape[:2]
    if img.shape[2] == 3:
        img = np.concatenate(
            [img, np.full((h, w, 1), 65535, np.uint16)], axis=2
        )
    return (
        FARBFELD_MAGIC
        + struct.pack(">II", w, h)
        + img.astype(">u2").tobytes()
    )
