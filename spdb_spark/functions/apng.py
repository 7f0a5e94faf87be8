"""APNG (animated PNG) decode/encode on top of the repo's PNG codec.

Built from the public APNG specification (now part of the W3C PNG third
edition): an acTL chunk before IDAT declares the animation; each frame
is an fcTL control chunk (canvas-relative rect, delay, dispose_op,
blend_op) followed by IDAT (first frame, when the default image
participates) or fdAT chunks (sequence number + IDAT-format data).
fcTL and fdAT share one consecutive sequence-number space starting at 0.

Frame compositing follows the spec: blend SOURCE replaces the rect,
OVER alpha-composites onto it; after a frame is output, dispose NONE
keeps the canvas, BACKGROUND clears the frame's rect to transparent
black, PREVIOUS reverts the rect to its pre-frame content. On the first
frame OVER degrades to SOURCE and PREVIOUS to BACKGROUND (spec rule).

Bomb posture (the GIF lessons, COVERAGE.md): cumulative frames x canvas
is budget-checked, dispose PREVIOUS snapshots only the frame RECT (a
full-canvas snapshot per frame is exactly the KB->GB amplification the
GIF decoder had to fix), and each frame's pixel data inflates through
png_decode's capped decompress.

No reference-repo counterpart; extends the real-decode multimodal
surface (PNG/GIF/JPEG/BMP/TIFF/ICO stills, GIF/APNG/AVI animation).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from spdb_spark.functions.limits import check_pixel_budget, check_total_budget
from spdb_spark.operators.render import _png_chunk, _PNG_SIG, png_decode

_DISPOSE_NONE, _DISPOSE_BACKGROUND, _DISPOSE_PREVIOUS = 0, 1, 2
_BLEND_SOURCE, _BLEND_OVER = 0, 1


def _walk_chunks(payload: bytes):
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        yield tag, body
        pos += 12 + length


def is_apng(payload: bytes) -> bool:
    """True iff a valid-position acTL chunk exists (walked chunk-by-chunk:
    a byte scan would false-positive on 'acTL' inside compressed IDAT)."""
    if payload[:8] != _PNG_SIG:
        return False
    for tag, _ in _walk_chunks(payload):
        if tag == b"acTL":
            return True
        if tag in (b"IDAT", b"IEND"):
            return False
    return False


def _to_rgba(img: np.ndarray) -> np.ndarray:
    """Any png_decode output -> (H,W,4) uint8 RGBA."""
    if img.dtype == np.uint16:
        img = (img >> 8).astype(np.uint8)
    if img.ndim == 2:
        out = np.empty((*img.shape, 4), np.uint8)
        out[..., 0] = out[..., 1] = out[..., 2] = img
        out[..., 3] = 255
        return out
    if img.shape[2] == 3:
        out = np.empty((*img.shape[:2], 4), np.uint8)
        out[..., :3] = img
        out[..., 3] = 255
        return out
    return img


def _blend_over(dst: np.ndarray, src: np.ndarray) -> np.ndarray:
    """Source-over alpha compositing in float, rounded to uint8."""
    sa = src[..., 3:4].astype(np.float64) / 255.0
    da = dst[..., 3:4].astype(np.float64) / 255.0
    oa = sa + da * (1.0 - sa)
    rgb = src[..., :3] * sa + dst[..., :3] * da * (1.0 - sa)
    safe = np.where(oa == 0.0, 1.0, oa)
    out = np.empty_like(dst)
    out[..., :3] = np.rint(rgb / safe).astype(np.uint8)
    out[..., 3] = np.rint(oa[..., 0] * 255.0).astype(np.uint8)
    return out


def apng_frames(payload: bytes) -> list[np.ndarray]:
    """-> list of composited (H,W,4) RGBA uint8 canvases, one per frame.
    A plain (non-animated) PNG yields its single image."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    ihdr = None
    plte = trns = None
    actl = None
    events: list[tuple[str, bytes]] = []
    for tag, body in _walk_chunks(payload):
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"acTL":
            actl = body
        elif tag == b"PLTE":
            plte = body
        elif tag == b"tRNS":
            trns = body
        elif tag == b"fcTL":
            events.append(("fctl", body))
        elif tag == b"IDAT":
            events.append(("idat", body))
        elif tag == b"fdAT":
            events.append(("fdat", body))
        elif tag == b"IEND":
            break
    if actl is None:
        return [_to_rgba(png_decode(payload))]
    if ihdr is None or len(ihdr) < 13:
        raise ValueError("apng: missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr[:13]
    )
    check_pixel_budget(w, h, "apng")

    # group events into frames: every fcTL starts one; IDAT before the
    # first fcTL is the non-animated default image (not a frame)
    frames: list[tuple[bytes, bytearray]] = []
    seqs: list[int] = []
    for kind, body in events:
        if kind == "fctl":
            if len(body) < 26:
                raise ValueError("apng: truncated fcTL")
            seqs.append(struct.unpack_from(">I", body, 0)[0])
            frames.append((body, bytearray()))
        elif kind == "idat":
            if frames:
                frames[-1][1].extend(body)
        else:  # fdat
            if not frames:
                raise ValueError("apng: fdAT before any fcTL")
            if len(body) < 4:
                raise ValueError("apng: truncated fdAT")
            seqs.append(struct.unpack_from(">I", body, 0)[0])
            frames[-1][1].extend(body[4:])
    if not frames:
        raise ValueError("apng: acTL without any fcTL")
    if seqs != list(range(len(seqs))):
        raise ValueError("apng: fcTL/fdAT sequence numbers not consecutive")
    check_total_budget((len(frames) + 1) * w * h, "apng")

    canvas = np.zeros((h, w, 4), np.uint8)
    out: list[np.ndarray] = []
    for fi, (fctl, data) in enumerate(frames):
        _seq, fw, fh, fx, fy = struct.unpack_from(">IIIII", fctl, 0)
        dispose, blend = fctl[24], fctl[25]
        if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
            raise ValueError("apng: frame rect outside canvas")
        if not data:
            raise ValueError("apng: frame without pixel data")
        if fi == 0:  # spec: first-frame degradations
            if blend == _BLEND_OVER:
                blend = _BLEND_SOURCE
            if dispose == _DISPOSE_PREVIOUS:
                dispose = _DISPOSE_BACKGROUND
        sub = (
            _PNG_SIG
            + _png_chunk(
                b"IHDR",
                struct.pack(">IIBBBBB", fw, fh, depth, color_type, comp, filt, interlace),
            )
            + (_png_chunk(b"PLTE", plte) if plte is not None else b"")
            + (_png_chunk(b"tRNS", trns) if trns is not None else b"")
            + _png_chunk(b"IDAT", bytes(data))
            + _png_chunk(b"IEND", b"")
        )
        src = _to_rgba(png_decode(sub))
        region = (slice(fy, fy + fh), slice(fx, fx + fw))
        saved = canvas[region].copy() if dispose == _DISPOSE_PREVIOUS else None
        if blend == _BLEND_SOURCE:
            canvas[region] = src
        else:
            canvas[region] = _blend_over(canvas[region], src)
        out.append(canvas.copy())
        if dispose == _DISPOSE_BACKGROUND:
            canvas[region] = 0
        elif dispose == _DISPOSE_PREVIOUS:
            canvas[region] = saved
    return out


def apng_encode(frames: list[np.ndarray], delay_ms: int = 100) -> bytes:
    """Animated PNG from same-shape gray8 (H,W) or RGBA (H,W,4) uint8
    frames: full-canvas rects, SOURCE blend, NONE dispose (so decode
    round-trips frame-for-frame). A single frame encodes as a plain PNG
    via png_encode's path with an animation of one."""
    if not frames:
        raise ValueError("apng: need at least one frame")
    first = frames[0]
    if any(f.shape != first.shape or f.dtype != np.uint8 for f in frames):
        raise ValueError("apng: frames must share shape and be uint8")
    if first.ndim == 2:
        color_type, channels = 0, 1
    elif first.ndim == 3 and first.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError("apng: frames must be (H,W) gray or (H,W,4) RGBA")
    h, w = first.shape[:2]

    def raw(f: np.ndarray) -> bytes:
        rows = f.reshape(h, w * channels)
        return zlib.compress(
            b"".join(b"\x00" + rows[r].tobytes() for r in range(h)), 6
        )

    def fctl(seq: int) -> bytes:
        return _png_chunk(
            b"fcTL",
            struct.pack(
                ">IIIIIHHBB", seq, w, h, 0, 0, delay_ms, 1000,
                _DISPOSE_NONE, _BLEND_SOURCE,
            ),
        )

    out = bytearray(_PNG_SIG)
    out += _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    )
    out += _png_chunk(b"acTL", struct.pack(">II", len(frames), 0))
    out += fctl(0)
    out += _png_chunk(b"IDAT", raw(frames[0]))
    seq = 1
    for f in frames[1:]:
        out += fctl(seq)
        seq += 1
        out += _png_chunk(b"fdAT", struct.pack(">I", seq) + raw(f))
        seq += 1
    out += _png_chunk(b"IEND", b"")
    return bytes(out)


def apng_frame_features(payload: bytes, n_frames: int, dim: int) -> np.ndarray:
    """(n_frames, dim) band features on the GIF/video schedule: a still
    (or single-frame animation) featurizes exactly like its PNG twin; an
    animation samples n_frames composited frames evenly."""
    from spdb_spark.functions.gif import _collapse_gray
    from spdb_spark.functions.multimodal import _image_frame_features
    from spdb_spark.functions.video import sample_frame_indices

    frames = apng_frames(payload)
    if len(frames) == 1:
        return _image_frame_features(_collapse_gray(frames[0]), n_frames, dim)
    out = np.zeros((n_frames, dim), dtype=np.float32)
    for row, i in enumerate(sample_frame_indices(len(frames), n_frames)):
        out[row] = _image_frame_features(_collapse_gray(frames[i]), 1, dim)[0]
    return out
