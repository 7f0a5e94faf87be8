"""Dependency-free GIF (GIF87a/GIF89a) codec: LZW decode/encode, interlace,
local/global palettes, transparency, and animated multi-frame composition
with all four disposal methods.

Built from the public GIF89a specification (CompuServe, 1990; mirrored by
W3C) — variable-width LSB-first LZW with CLEAR/EOI codes, 255-byte
sub-block framing, the 8/8/4/2 interlace row schedule, and the graphic
control extension's disposal/transparency semantics. No reference-repo
counterpart (jhuapl-boss/spdb renders PNG tiles only, imagecube.py:104);
this extends the multimodal ingest surface so real-web GIF payloads decode
for real instead of falling to the labeled stub path.

Encode is intentionally exact-or-refuse: grayscale uint8 (fixed 256-gray
palette) and RGB/RGBA images with <= 256 distinct colors (computed
palette) round-trip losslessly; RGBA with binary alpha maps the
transparent pixels onto one reserved palette slot behind a graphic
control extension. Anything needing color quantization (>256 colors,
partial alpha) raises ValueError rather than silently approximating.
"""

from __future__ import annotations

import struct

import numpy as np

from spdb_spark.functions.limits import check_pixel_budget, check_total_budget

GIF_SIGS = (b"GIF87a", b"GIF89a")

# Interlace pass schedule: (first row, row step) per GIF89a appendix E.
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))

_MAX_CODE_WIDTH = 12
_TABLE_LIMIT = 1 << _MAX_CODE_WIDTH  # 4096


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width 3..12 bits, LSB-first, CLEAR/EOI codes)
# ---------------------------------------------------------------------------


def lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """Decode a GIF LZW stream (sub-block framing already stripped) into
    exactly ``n_pixels`` palette indices. Tolerates a missing EOI (common
    in the wild) but raises on codes past the table frontier."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # table[i] is the byte string for code i; None marks CLEAR/EOI slots.
    table: list[bytes | None] = [bytes([i]) for i in range(clear)] + [None, None]
    code_size = min_code_size + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    data_len = len(data)
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= data_len:
                if len(out) < n_pixels:
                    raise ValueError("GIF LZW stream truncated")
                return bytes(out)
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [None, None]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("GIF LZW: first code after CLEAR not a root")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            if len(table) < _TABLE_LIMIT:
                table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            if len(table) < _TABLE_LIMIT:
                table.append(entry)
        else:
            raise ValueError("GIF LZW: code past table frontier")
        out += entry
        prev = entry
        # Width grows when the NEXT code could index the next table slot.
        if len(table) == (1 << code_size) and code_size < _MAX_CODE_WIDTH:
            code_size += 1
    return bytes(out[:n_pixels])


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Encode palette indices as a GIF LZW stream (no sub-block framing).
    Emits CLEAR up front and again whenever the table fills, EOI at the
    end — the strictly-spec-conformant encoder every decoder accepts."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)

    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], code_size)
        if next_code < _TABLE_LIMIT:
            table[cand] = next_code
            # The decoder widens when its table reaches 2^code_size; we
            # added the same entry, so widen in lockstep BEFORE the next
            # emit.
            if next_code == (1 << code_size) and code_size < _MAX_CODE_WIDTH:
                code_size += 1
            next_code += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Frame a byte stream into <=255-byte length-prefixed sub-blocks plus
    the zero terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container parse
# ---------------------------------------------------------------------------


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("GIF: sub-block stream truncated")
        size = payload[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise ValueError("GIF: sub-block overruns payload")
        out += payload[pos : pos + size]
        pos += size


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """Reorder interlaced row storage into display order."""
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for first, step in _INTERLACE_PASSES:
        for r in range(first, h, step):
            out[r] = rows[src]
            src += 1
    return out


def _interlace_order(h: int) -> list[int]:
    order: list[int] = []
    for first, step in _INTERLACE_PASSES:
        order.extend(range(first, h, step))
    return order


def gif_frames(payload: bytes) -> list[np.ndarray]:
    """Decode every frame of a GIF, composited per the graphic control
    extension's disposal method, each as an (H, W, 4) RGBA uint8 canvas
    snapshot at logical-screen size. Disposal 0/1 leave the canvas, 2
    restores the frame rectangle to transparent-or-background, 3 restores
    the pre-frame canvas."""
    if payload[:6] not in GIF_SIGS:
        raise ValueError("not a GIF payload")
    width, height, flags, bg_index, _aspect = struct.unpack_from(
        "<HHBBB", payload, 6
    )
    check_pixel_budget(width, height, "GIF")
    pos = 13
    global_palette: np.ndarray | None = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_palette = np.frombuffer(
            payload[pos : pos + 3 * n], np.uint8
        ).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((height, width, 4), np.uint8)
    # GIF89a: the background color only shows where no prior frame drew;
    # browsers render it transparent, and so do we (bg_index kept for the
    # disposal-2 fill when the global palette marks it opaque is a legacy
    # behavior modern renderers dropped — we match them: transparent).
    frames: list[np.ndarray] = []
    transparent_idx: int | None = None
    disposal = 0

    n_payload = len(payload)
    while pos < n_payload:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n_payload:
                raise ValueError("GIF: extension truncated")
            label = payload[pos]
            pos += 1
            data, pos = _read_sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gflags = data[0]
                disposal = (gflags >> 2) & 0x07
                transparent_idx = data[3] if gflags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block introducer 0x{block:02x}")

        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + fw > width or top + fh > height:
            raise ValueError("GIF: frame rectangle outside the logical screen")
        palette = global_palette
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            palette = np.frombuffer(
                payload[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if palette is None:
            raise ValueError("GIF: image has neither local nor global palette")
        min_code_size = payload[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError("GIF: invalid LZW minimum code size")
        data, pos = _read_sub_blocks(payload, pos)
        idx = np.frombuffer(
            lzw_decode(data, min_code_size, fw * fh), np.uint8
        ).reshape(fh, fw)
        if iflags & 0x40:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("GIF: palette index out of range")

        rgba = np.empty((fh, fw, 4), np.uint8)
        rgba[..., :3] = palette[idx]
        rgba[..., 3] = 255
        opaque = np.ones((fh, fw), bool)
        if transparent_idx is not None:
            opaque = idx != transparent_idx
            rgba[~opaque, 3] = 0

        before = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        region[opaque] = rgba[opaque]
        # each frame snapshot is a full canvas: budget the CUMULATIVE
        # output, or a few-KB animation amplifies to gigabytes
        check_total_budget((len(frames) + 1) * width * height, "GIF")
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = 0
        elif disposal == 3 and before is not None:
            canvas = before
        transparent_idx = None
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image data")
    return frames


def gif_decode(payload: bytes) -> np.ndarray:
    """Decode the first frame. Returns (H, W) grayscale uint8 when the
    frame is fully opaque and every palette color used is gray (the shape
    png_decode returns for gray images, so band features agree across
    codecs); otherwise (H, W, 4) RGBA uint8."""
    frame = gif_frames(payload)[0]
    out = _collapse_gray(frame)
    return out.copy() if out.ndim == 2 else frame


# ---------------------------------------------------------------------------
# Encode
# ---------------------------------------------------------------------------


def _palettize(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, int | None]:
    """(palette (N,3) uint8, indices (H,W) uint8, transparent index or
    None) for an exactly-encodable image; raises ValueError when color
    quantization would be needed. Binary alpha (every pixel 0 or 255) maps
    the fully-transparent pixels onto one reserved palette slot; partial
    alpha has no lossless GIF representation and refuses."""
    if img.dtype != np.uint8:
        raise ValueError("GIF encode requires uint8 pixels")
    if img.ndim == 2:
        palette = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        return palette, img, None
    if img.ndim == 3 and img.shape[2] in (3, 4):
        transparent = None
        if img.shape[2] == 4:
            alpha = img[..., 3]
            if not np.isin(alpha, (0, 255)).all():
                raise ValueError(
                    "GIF encode: partial alpha needs quantization to a "
                    "binary mask — encode refuses to approximate"
                )
            transparent = ~(alpha == 255)
            if not transparent.any():
                transparent = None
            img = img[..., :3]
        flat = img.reshape(-1, 3)
        if transparent is not None:
            # Palettize only the opaque pixels; transparent ones take the
            # reserved slot (color irrelevant — decoders must ignore it).
            opaque_flat = flat[~transparent.reshape(-1)]
            palette = np.unique(opaque_flat, axis=0)
            if len(palette) > 255:
                raise ValueError(
                    f"GIF encode: {len(palette)} opaque colors + the "
                    "transparent slot > 256 — quantize upstream"
                )
            t_idx = len(palette)
            idx = np.full(flat.shape[0], t_idx, np.uint8)
            if len(opaque_flat):
                # searchsorted over the lexicographically-sorted palette
                # (np.unique sorts rows) recovers each pixel's index.
                keys = (
                    flat[:, 0].astype(np.int64) * 65536
                    + flat[:, 1].astype(np.int64) * 256
                    + flat[:, 2]
                )
                pal_keys = (
                    palette[:, 0].astype(np.int64) * 65536
                    + palette[:, 1].astype(np.int64) * 256
                    + palette[:, 2]
                )
                mask = ~transparent.reshape(-1)
                idx[mask] = np.searchsorted(pal_keys, keys[mask]).astype(np.uint8)
            palette = np.vstack([palette, np.zeros((1, 3), np.uint8)])
            return (
                palette.astype(np.uint8),
                idx.reshape(img.shape[:2]),
                t_idx,
            )
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise ValueError(
                f"GIF encode: {len(palette)} distinct colors > 256 — "
                "quantize upstream"
            )
        return (
            palette.astype(np.uint8),
            inverse.astype(np.uint8).reshape(img.shape[:2]),
            None,
        )
    raise ValueError("GIF encode expects (H,W), (H,W,3) or (H,W,4) uint8")


def _palette_block(palette: np.ndarray) -> tuple[bytes, int]:
    """Pad a palette to the next power-of-two size >= 2 and return
    (raw bytes, size exponent field)."""
    n = len(palette)
    bits = max(1, (max(n, 2) - 1).bit_length())
    full = np.zeros((1 << bits, 3), np.uint8)
    full[:n] = palette
    return full.tobytes(), bits - 1


def gif_encode(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode one image as a non-animated GIF89a, losslessly (see module
    docstring for the accepted inputs; binary alpha becomes a transparent
    palette index via a graphic control extension)."""
    palette, idx, transparent = _palettize(img)
    h, w = idx.shape
    pal_bytes, size_field = _palette_block(palette)
    min_code_size = max(2, int(palette.shape[0] - 1).bit_length())

    rows = idx
    if interlace:
        rows = idx[_interlace_order(h)]

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (size_field << 4) | size_field, 0, 0)
    out += pal_bytes
    if transparent is not None:
        out += b"\x21\xf9\x04\x01" + struct.pack("<HB", 0, transparent) + b"\x00"
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    out.append(min_code_size)
    out += _sub_blocks(lzw_encode(rows.tobytes(), min_code_size))
    out += b"\x3b"
    return bytes(out)


def gif_encode_frames(
    frames: list[np.ndarray], disposal: int = 1, delay_cs: int = 4
) -> bytes:
    """Encode an animated GIF89a from full-canvas frames (each the same
    shape, same exactness rules as gif_encode). Every frame is written
    full-rectangle with the given disposal method — the simple, always-
    correct animation form (delta-rect optimization is a size win only)."""
    if not frames:
        raise ValueError("GIF encode: no frames")
    mats = [_palettize(f) for f in frames]
    h, w = mats[0][1].shape
    if any(i.shape != (h, w) for _, i, _ in mats):
        raise ValueError("GIF encode: frames must share one shape")

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0, 0, 0)  # no global palette
    # NETSCAPE2.0 loop-forever block — ubiquitous, keeps real viewers happy.
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for palette, idx, transparent in mats:
        pal_bytes, size_field = _palette_block(palette)
        min_code_size = max(2, int(palette.shape[0] - 1).bit_length())
        gflags = ((disposal & 0x07) << 2) | (1 if transparent is not None else 0)
        out += b"\x21\xf9\x04" + bytes([gflags])
        out += struct.pack("<HB", delay_cs, transparent or 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x80 | size_field)
        out += pal_bytes
        out.append(min_code_size)
        out += _sub_blocks(lzw_encode(idx.tobytes(), min_code_size))
    out += b"\x3b"
    return bytes(out)


def _collapse_gray(frame: np.ndarray) -> np.ndarray:
    """A fully-opaque all-gray RGBA frame becomes 2-D grayscale (the shape
    png_decode gives gray images) so features agree across codecs."""
    if (frame[..., 3] == 255).all():
        r, g, b = frame[..., 0], frame[..., 1], frame[..., 2]
        if (r == g).all() and (g == b).all():
            return r
    return frame


def gif_frame_features(payload: bytes, n_frames: int, dim: int) -> np.ndarray:
    """(n_frames, dim) band features. A single-frame GIF featurizes as a
    still image (n_frames horizontal bands — bit-for-bit what its PNG
    twin produces); an animation samples n_frames frames evenly on the
    same schedule as video_frame_features and featurizes each composited
    frame as one band."""
    from spdb_spark.functions.multimodal import _image_frame_features
    from spdb_spark.functions.video import sample_frame_indices

    frames = gif_frames(payload)
    if len(frames) == 1:
        return _image_frame_features(_collapse_gray(frames[0]), n_frames, dim)
    out = np.zeros((n_frames, dim), dtype=np.float32)
    for row, i in enumerate(sample_frame_indices(len(frames), n_frames)):
        out[row] = _image_frame_features(_collapse_gray(frames[i]), 1, dim)[0]
    return out
