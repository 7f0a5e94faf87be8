"""Dependency-free QOI codec (the "Quite OK Image" format, qoiformat.org
— public one-page spec). QOI shows up in game-asset and ML-dataset dumps
as a fast lossless interchange format; decoding it extends the
real-decode multimodal surface with zero tables and zero entropy coding.

Format (from the spec): 14-byte header (magic ``qoif``, width/height
u32 big-endian, channels 3|4, colorspace 0|1), then a byte stream of
eight ops — RGB (0xFE), RGBA (0xFF), and six-bit-tagged INDEX / DIFF /
LUMA / RUN — closed by seven 0x00 bytes and one 0x01. Decoder state is
the previous pixel (start ``(0,0,0,255)``) and a 64-slot recent-pixel
array keyed by ``(3r+5g+7b+11a) % 64``. All diffs wrap mod 256.

Scale posture: QOI is sequential per payload (each op depends on the
previous pixel), so the kernel is a per-image Python loop — but images
are independent, so decode parallelism is scan parallelism like every
other codec here, and payload size is budget-checked before the loop.
"""

from __future__ import annotations

import struct

import numpy as np

from spdb_spark.functions.limits import check_pixel_budget

QOI_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def qoi_decode(payload: bytes) -> np.ndarray:
    """-> (H,W,3) uint8 RGB or (H,W,4) uint8 RGBA per the header's
    channel count (the channel field is informative; the stream may mix
    RGB and RGBA ops — alpha is tracked regardless)."""
    if payload[:4] != QOI_MAGIC or len(payload) < 14 + len(_END):
        raise ValueError("not a QOI payload")
    w, h = struct.unpack(">II", payload[4:12])
    channels, colorspace = payload[12], payload[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError("qoi: bad header")
    if w <= 0 or h <= 0:
        raise ValueError("qoi: bad dimensions")
    check_pixel_budget(w, h, "qoi")

    n_px = w * h
    out = np.empty((n_px, 4), np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    i, p = 14, 0
    end = len(payload) - len(_END)
    data = payload
    while p < n_px:
        if i >= end:
            raise ValueError("qoi: stream truncated")
        b1 = data[i]
        i += 1
        if b1 == 0xFE:  # QOI_OP_RGB
            r, g, b = data[i], data[i + 1], data[i + 2]
            i += 3
        elif b1 == 0xFF:  # QOI_OP_RGBA
            r, g, b, a = data[i], data[i + 1], data[i + 2], data[i + 3]
            i += 4
        else:
            tag = b1 >> 6
            if tag == 0:  # QOI_OP_INDEX
                r, g, b, a = index[b1]
            elif tag == 1:  # QOI_OP_DIFF (2-bit diffs, bias 2)
                r = (r + ((b1 >> 4) & 3) - 2) & 0xFF
                g = (g + ((b1 >> 2) & 3) - 2) & 0xFF
                b = (b + (b1 & 3) - 2) & 0xFF
            elif tag == 2:  # QOI_OP_LUMA (6-bit dg bias 32; dr/db rel dg bias 8)
                dg = (b1 & 0x3F) - 32
                b2 = data[i]
                i += 1
                r = (r + dg + ((b2 >> 4) & 0x0F) - 8) & 0xFF
                g = (g + dg) & 0xFF
                b = (b + dg + (b2 & 0x0F) - 8) & 0xFF
            else:  # QOI_OP_RUN (bias -1; 63/64 are the RGB/RGBA tags)
                run = (b1 & 0x3F) + 1
                if p + run > n_px:
                    raise ValueError("qoi: run overflows image")
                out[p : p + run] = (r, g, b, a)
                p += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[p] = (r, g, b, a)
        p += 1
    if data[i : i + len(_END)] != _END:
        raise ValueError("qoi: missing end marker")
    img = out.reshape(h, w, 4)
    return img[:, :, :3].copy() if channels == 3 else img


def qoi_encode(img: np.ndarray, colorspace: int = 0) -> bytes:
    """(H,W,3) RGB / (H,W,4) RGBA / (H,W) gray uint8 -> QOI bytes
    (gray encodes as RGB with equal channels, like the PNM twin)."""
    if img.dtype != np.uint8:
        raise ValueError("qoi encode expects uint8")
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    if img.ndim != 3 or img.shape[2] not in (3, 4):
        raise ValueError("qoi encode expects (H,W), (H,W,3) or (H,W,4)")
    h, w, channels = img.shape
    px = img.reshape(-1, channels)
    if channels == 3:
        px = np.concatenate(
            [px, np.full((px.shape[0], 1), 255, np.uint8)], axis=1
        )
    out = bytearray(QOI_MAGIC)
    out += struct.pack(">II", w, h)
    out += bytes((channels, colorspace))

    index = [(0, 0, 0, 0)] * 64
    pr, pg, pb, pa = 0, 0, 0, 255
    run = 0
    for r, g, b, a in map(tuple, px.tolist()):
        if (r, g, b, a) == (pr, pg, pb, pa):
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        ih = _hash(r, g, b, a)
        if index[ih] == (r, g, b, a):
            out.append(ih)
        else:
            index[ih] = (r, g, b, a)
            if a == pa:
                vr = ((r - pr + 128) & 0xFF) - 128
                vg = ((g - pg + 128) & 0xFF) - 128
                vb = ((b - pb + 128) & 0xFF) - 128
                if -2 <= vr <= 1 and -2 <= vg <= 1 and -2 <= vb <= 1:
                    out.append(0x40 | ((vr + 2) << 4) | ((vg + 2) << 2) | (vb + 2))
                elif (
                    -32 <= vg <= 31
                    and -8 <= vr - vg <= 7
                    and -8 <= vb - vg <= 7
                ):
                    out.append(0x80 | (vg + 32))
                    out.append(((vr - vg + 8) << 4) | (vb - vg + 8))
                else:
                    out += bytes((0xFE, r, g, b))
            else:
                out += bytes((0xFF, r, g, b, a))
        pr, pg, pb, pa = r, g, b, a
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)
