"""Dependency-free AVI (RIFF) container codec for video payloads, making
the `kind='video'` leg of the multimodal pipeline REAL for MPNG streams
(AVI carrying PNG-compressed frames — a real FourCC; each frame decodes
through the repo's own PNG codec). Other video codecs (H.264/VP9/...)
cannot be decoded in pure Python and keep the documented stub.

The container layer is the part a Spark pipeline owns: chunk walking,
frame extraction, and deterministic frame SAMPLING (pick n_frames evenly
across the stream) — per-frame pixel decode then reuses
operators/render.png_decode. Encode writes a minimal but well-formed
single-stream AVI (avih + strl headers, movi '00dc' chunks) sufficient
for interchange and round-trip tests.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def avi_encode_mpng(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Pack PNG-encoded frames into a single-stream AVI (FourCC MPNG)."""
    n = len(frames)
    usec_per_frame = int(1_000_000 / max(fps, 1))
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<14I",
        usec_per_frame, max_bytes * fps, 0, 0,  # no index chunk: flags 0
        n, 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MPNG", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0xFFFFFFFF, 0,
        0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MPNG", 0, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_encode_dib(images: list[np.ndarray], fps: int = 10) -> bytes:
    """Pack UNCOMPRESSED frames (all (H,W) gray or (H,W,3) RGB uint8)
    into a single-stream AVI (BI_RGB DIB '00db' chunks, bottom-up rows,
    4-byte stride padding, gray palette for 8-bit) — the raw-video AVI
    every capture tool can emit."""
    if not images:
        raise ValueError("avi: no frames")
    h, w = images[0].shape[:2]
    gray = images[0].ndim == 2
    if any(i.shape != images[0].shape or i.dtype != np.uint8 for i in images):
        raise ValueError("avi: frames must share one uint8 shape")
    bpp = 8 if gray else 24
    stride = (w * bpp // 8 + 3) & ~3
    frames = []
    for img in images:
        rows = img if gray else img[..., ::-1]  # RGB -> BGR
        flat = rows.reshape(h, -1)
        pad = b"\x00" * (stride - flat.shape[1])
        frames.append(b"".join(flat[r].tobytes() + pad for r in range(h - 1, -1, -1)))
    n = len(frames)
    usec_per_frame = int(1_000_000 / max(fps, 1))
    avih = struct.pack(
        "<14I", usec_per_frame, stride * h * fps, 0, 0, n, 0, 1, 0,
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, stride * h, 0xFFFFFFFF, 0,
        0, 0, w, h,
    )
    palette = (
        b"".join(struct.pack("<BBBB", v, v, v, 0) for v in range(256))
        if gray
        else b""
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, bpp, 0, stride * h, 0, 0, 256 if gray else 0, 0,
    ) + palette
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00db", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_stream_format(payload: bytes) -> tuple[int, int, int, bytes, bytes]:
    """-> (width, height, bits_per_pixel, compression fourcc, palette
    bytes) from the strf BITMAPINFOHEADER (BI_RGB fourcc normalized to
    b'DIB '). Height keeps its SIGN: negative means top-down row order,
    and dropping it would silently flip every decoded frame."""
    idx = payload.find(b"strf")
    if idx < 0 or idx + 48 > len(payload):
        raise ValueError("avi: missing strf")
    base = idx + 8
    w, h, _planes, bpp, comp = struct.unpack_from("<iiHHI", payload, base + 4)
    n_colors = struct.unpack_from("<I", payload, base + 32)[0]
    fourcc = b"DIB " if comp == 0 else struct.pack("<I", comp)
    palette = b""
    if bpp == 8:
        n_colors = n_colors or 256
        palette = payload[base + 40 : base + 40 + 4 * n_colors]
    return w, h, bpp, fourcc, palette


def _dib_frame_decode(blob: bytes, w: int, h: int, bpp: int, palette: bytes) -> np.ndarray:
    """Decode one raw DIB frame by wrapping it as a BMP and reusing the
    tested bmp_decode path (same row order incl. the top-down negative
    height, stride, palette rules)."""
    from spdb_spark.functions.bmp import bmp_decode

    offset = 14 + 40 + len(palette)
    header = (
        b"BM" + struct.pack("<IHHI", offset + len(blob), 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, len(blob), 0, 0,
                      len(palette) // 4, 0)
    )
    return bmp_decode(header + palette + blob)


def avi_frames(payload: bytes) -> list[bytes]:
    """Extract the frame byte blobs from an AVI payload by walking the
    RIFF chunk tree to LIST 'movi' and collecting '..dc'/'..db' entries.
    Codec-agnostic: returns the encoded frame bytes in stream order."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int, in_movi: bool) -> None:
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body_start = pos + 8
            body_end = min(body_start + size, end)
            if cid == b"LIST":
                kind = buf[body_start : body_start + 4]
                walk(buf, body_start + 4, body_end, in_movi or kind == b"movi")
            elif in_movi and cid[2:4] in (b"dc", b"db"):
                frames.append(buf[body_start:body_end])
            pos = body_start + size + (size & 1)

    walk(payload, 12, 8 + struct.unpack("<I", payload[4:8])[0], False)
    return frames


def sample_frame_indices(n_available: int, n_wanted: int) -> list[int]:
    """Deterministic even sampling: frame i of n_wanted maps to
    floor(i * n_available / n_wanted) — first frame always included,
    stride uniform, no randomness."""
    if n_available <= 0 or n_wanted <= 0:
        return []
    return [min(i * n_available // n_wanted, n_available - 1) for i in range(n_wanted)]


def video_frame_features(payload: bytes, n_frames: int, dim: int) -> np.ndarray:
    """(n_frames, dim) features: sample n_frames evenly from the AVI
    stream; PNG-compressed frames (MPNG) decode through the repo's PNG
    codec, JPEG-compressed frames (MJPG — the Motion-JPEG FourCC every
    OpenCV writer emits) through functions/jpeg.py, and uncompressed
    BI_RGB frames ('DIB ', raw capture output) through the BMP row
    machinery; all get the same band features as still images. A frame
    in any other codec (H.264/VP9/...) raises and the caller's dispatch
    keeps the payload on the labeled stub path."""
    from spdb_spark.functions.multimodal import _PNG_SIG, _image_frame_features
    from spdb_spark.operators.render import png_decode

    frames = avi_frames(payload)
    dib = None
    out = np.zeros((n_frames, dim), dtype=np.float32)
    for row, idx in enumerate(sample_frame_indices(len(frames), n_frames)):
        blob = frames[idx]
        if blob[:8] == _PNG_SIG:
            img = png_decode(blob)
        elif blob[:2] == b"\xff\xd8":
            from spdb_spark.functions.jpeg import jpeg_decode

            img = jpeg_decode(blob)
        else:
            if dib is None:
                dib = avi_stream_format(payload)
            w, h, bpp, fourcc, palette = dib
            if fourcc != b"DIB " or bpp not in (8, 24, 32):
                # external-adapter seam (functions/lossy.py): a deployment
                # with ffmpeg/PyAV registers a "video" decoder and the
                # whole payload re-decodes through it (same sampling +
                # feature contract); pure-Python codecs never route here
                from spdb_spark.functions.lossy import get_decoder

                ext = get_decoder("video")
                if ext is not None:
                    imgs = ext(payload, n_frames)
                    return np.stack(
                        [_image_frame_features(im, 1, dim)[0] for im in imgs]
                    )
                raise ValueError(
                    "non-PNG/JPEG/DIB frame codec — pure-Python decode "
                    "unavailable"
                )
            img = _dib_frame_decode(blob, w, h, bpp, palette)
        out[row] = _image_frame_features(img, 1, dim)[0]
    return out
