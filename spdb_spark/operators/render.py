"""Presentation operators: plane slices and annotation recoloring
(reference: imagecube.py:104-300 xy/xz/yz_image, recolorCube.c + rgbColor.py).

Slices are plain filters (distributed until the final driver-side reshape);
recolor maps annotation ids to stable RGBA via a broadcast palette. The
reference uses a fixed 181-entry palette keyed `id % 181`
(ndlib.py:247-261); we keep the mod-181 keying but generate the palette
deterministically from the portable hash instead of copying the table."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PALETTE_SIZE = 181


def palette_df(spark) -> DataFrame:
    """Deterministic 181-entry RGBA palette (alpha=255), id-keyed."""
    import hashlib

    rows = []
    for i in range(PALETTE_SIZE):
        h = hashlib.md5(f"palette:{i}".encode()).digest()
        rows.append((i, h[0], h[1], h[2], 255))
    return spark.createDataFrame(rows, "pid int, r int, g int, b int, a int")


def recolor(v: DataFrame) -> DataFrame:
    """Annotation ids -> RGBA columns via broadcast palette join keyed
    value % 181 (recolorCube.c semantics; background id 0 stays
    transparent black)."""
    spark = v.sparkSession
    pal = F.broadcast(palette_df(spark))
    keyed = v.withColumn("pid", (F.col("value") % PALETTE_SIZE).cast("int"))
    joined = keyed.join(pal, "pid", "left")
    blk = F.col("value") == 0
    return joined.select(
        *[c for c in v.columns],
        F.when(blk, 0).otherwise(F.col("r")).alias("r"),
        F.when(blk, 0).otherwise(F.col("g")).alias("g"),
        F.when(blk, 0).otherwise(F.col("b")).alias("b"),
        F.when(blk, 0).otherwise(F.col("a")).alias("a"),
    )


def _slice_to_array(pdf, h_col, w_col, h0, h1, w0, w1, dtype):
    out = np.zeros((h1 - h0, w1 - w0), dtype=dtype)
    if len(pdf):
        out[
            pdf[h_col].to_numpy() - h0, pdf[w_col].to_numpy() - w0
        ] = pdf["value"].to_numpy().astype(dtype)
    return out


def tile_grid(v: DataFrame, z: int, t: int, tile_size: int = 512) -> DataFrame:
    """Distributed tile manifest for one XY plane: one row per non-empty
    tile — (tile_y, tile_x, n_voxels, sum_value, content_hash), the index
    a tile service serves from (reference: the Boss tile endpoint slices
    cutouts into fixed 512^2 tiles; imagecube.py xyImage is the per-tile
    render this manifests).

    One groupBy over the z/t-pruned scan: tile id = (y div ts, x div ts),
    content_hash = md5 over the row-major-ordered (offset:value) pairs, so
    two runs (or two engines) agree bit-for-bit on tile contents without
    shipping payloads. Requires coordinate-deduped voxels (offset unique
    per tile) — the hash order is then total."""
    ts = tile_size
    plane = v.where((F.col("z") == z) & (F.col("t") == t))
    off = (F.col("y") % ts) * ts + (F.col("x") % ts)
    cells = plane.select(
        F.floor(F.col("y") / ts).cast("long").alias("tile_y"),
        F.floor(F.col("x") / ts).cast("long").alias("tile_x"),
        off.cast("long").alias("off"),
        "value",
    )
    return (
        cells.groupBy("tile_y", "tile_x")
        .agg(
            F.count("*").alias("n_voxels"),
            F.sum("value").alias("sum_value"),
            F.array_sort(F.collect_list(F.struct("off", "value"))).alias("cells"),
        )
        .select(
            "tile_y",
            "tile_x",
            "n_voxels",
            "sum_value",
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(F.col("cells"), lambda s:
                        F.concat_ws(":", s["off"].cast("string"), s["value"].cast("string"))
                    ),
                )
            ).alias("content_hash"),
        )
    )


def tile_payloads(
    v: DataFrame, z: int, t: int, tile_size: int = 512, dtype: str = "uint64"
) -> DataFrame:
    """Dense tile bytes: (tile_y, tile_x, payload) where payload is the
    row-major tile_size^2 array (zeros filled) as little-endian bytes —
    what a tile server PNG-encodes per request. Grouped Arrow batches
    (applyInPandas): each task materializes only its own tiles, so the
    export is embarrassingly parallel and driver memory stays flat."""
    ts = tile_size

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (ty, tx), g in pdf.groupby(["tile_y", "tile_x"]):
            arr = np.zeros(ts * ts, dtype=np.dtype(dtype).newbyteorder("<"))
            arr[g["off"].to_numpy()] = g["value"].to_numpy().astype(arr.dtype)
            out.append((ty, tx, arr.tobytes()))
        return pd.DataFrame(out, columns=["tile_y", "tile_x", "payload"])

    plane = v.where((F.col("z") == z) & (F.col("t") == t))
    cells = plane.select(
        F.floor(F.col("y") / ts).cast("long").alias("tile_y"),
        F.floor(F.col("x") / ts).cast("long").alias("tile_x"),
        ((F.col("y") % ts) * ts + (F.col("x") % ts)).cast("long").alias("off"),
        "value",
    )
    return cells.groupBy("tile_y", "tile_x").applyInPandas(
        _pack, "tile_y long, tile_x long, payload binary"
    )


def xy_slice(v: DataFrame, z: int, t: int, x_rng, y_rng, dtype="uint64") -> np.ndarray:
    """XY plane at one z (imagecube.py xy_image): filter -> driver reshape."""
    pdf = (
        v.where((F.col("z") == z) & (F.col("t") == t))
        .where((F.col("x") >= x_rng[0]) & (F.col("x") < x_rng[1]))
        .where((F.col("y") >= y_rng[0]) & (F.col("y") < y_rng[1]))
        .select("x", "y", "value")
        .toPandas()
    )
    return _slice_to_array(pdf, "y", "x", y_rng[0], y_rng[1], x_rng[0], x_rng[1], dtype)


def xz_slice(v: DataFrame, y: int, t: int, x_rng, z_rng, dtype="uint64") -> np.ndarray:
    pdf = (
        v.where((F.col("y") == y) & (F.col("t") == t))
        .where((F.col("x") >= x_rng[0]) & (F.col("x") < x_rng[1]))
        .where((F.col("z") >= z_rng[0]) & (F.col("z") < z_rng[1]))
        .select("x", "z", "value")
        .toPandas()
    )
    return _slice_to_array(pdf, "z", "x", z_rng[0], z_rng[1], x_rng[0], x_rng[1], dtype)


def yz_slice(v: DataFrame, x: int, t: int, y_rng, z_rng, dtype="uint64") -> np.ndarray:
    pdf = (
        v.where((F.col("x") == x) & (F.col("t") == t))
        .where((F.col("y") >= y_rng[0]) & (F.col("y") < y_rng[1]))
        .where((F.col("z") >= z_rng[0]) & (F.col("z") < z_rng[1]))
        .select("y", "z", "value")
        .toPandas()
    )
    return _slice_to_array(pdf, "z", "y", z_rng[0], z_rng[1], y_rng[0], y_rng[1], dtype)


# ---------------------------------------------------------------------------
# PNG export (reference: imagecube.py:104-150 xy/xz/yz_image -> PIL 'L'
# images; annocube.py:103-160 -> RGBA false color). The container has no
# PIL, so this is a dependency-free PNG codec over zlib: grayscale 8/16-bit
# and RGBA8, filter type 0, one IDAT. Decode is provided so tests can
# round-trip bytes back to the exact array.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """PNG bytes for a 2D uint8 (gray8), 2D uint16 (gray16), (H, W, 3)
    uint8 (RGB) or (H, W, 4) uint8 (RGBA) array."""
    import struct
    import zlib

    if arr.ndim == 2 and arr.dtype == np.uint8:
        color_type, bit_depth, row_bytes = 0, 8, arr
    elif arr.ndim == 2 and arr.dtype == np.uint16:
        color_type, bit_depth = 0, 16
        row_bytes = arr.astype(">u2")  # PNG sample order is big-endian
    elif arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8:
        color_type, bit_depth, row_bytes = 2, 8, arr
    elif arr.ndim == 3 and arr.shape[2] == 4 and arr.dtype == np.uint8:
        color_type, bit_depth, row_bytes = 6, 8, arr
    else:
        raise ValueError(f"unsupported array for PNG: {arr.dtype} {arr.shape}")
    h, w = arr.shape[:2]
    raw = b"".join(
        b"\x00" + row_bytes[i].tobytes() for i in range(h)
    )  # filter type 0 per scanline
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass grid: (x0, y0, dx, dy) per PNG spec section on interlacing.
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 1, 2), (0, 1, 1, 1),
)


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytearray:
    """Reverse the five PNG scanline filters (None/Sub/Up/Average/Paeth).
    Sub is a per-lane modular prefix sum and Up a modular add (numpy);
    Average/Paeth reference the reconstructed left neighbor through a
    nonlinear predictor, so those rows genuinely walk byte-by-byte."""
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for r in range(h):
        off = r * (stride + 1)
        ftype = raw[off]
        cur = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: per-lane modular prefix sum (vectorized)
            arr = np.frombuffer(bytes(cur), np.uint8).copy()
            for lane in range(bpp):
                np.cumsum(arr[lane::bpp], dtype=np.uint8, out=arr[lane::bpp])
            cur = bytearray(arr.tobytes())
        elif ftype == 2:  # Up: one modular add (vectorized)
            arr = np.frombuffer(bytes(cur), np.uint8) + np.frombuffer(
                bytes(prev), np.uint8
            )
            cur = bytearray(arr.tobytes())
        elif ftype == 3:  # Average
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[r * stride : (r + 1) * stride] = cur
        prev = cur
    return out


def _png_samples(
    rows: bytearray, h: int, w: int, channels: int, depth: int
) -> np.ndarray:
    """Unfiltered scanline bytes -> (h, w, channels) sample array in the
    stream's native precision (uint8 for depth<=8, uint16 for 16)."""
    if depth == 16:
        arr = np.frombuffer(bytes(rows), ">u2").reshape(h, w, channels)
        return arr.astype(np.uint16)
    if depth == 8:
        return np.frombuffer(bytes(rows), np.uint8).reshape(h, w, channels).copy()
    # 1/2/4-bit (gray or palette indices), packed MSB-first per scanline
    stride = (w * channels * depth + 7) // 8
    bits = np.unpackbits(
        np.frombuffer(bytes(rows), np.uint8).reshape(h, stride), axis=1
    )[:, : w * depth]
    vals = np.zeros((h, w), np.uint8)
    for b in range(depth):
        vals = (vals << 1) | bits[:, b::depth]
    return vals[:, :, None]


def png_decode(data: bytes) -> np.ndarray:
    """Full-web PNG decode: color types 0 (gray), 2 (RGB), 3 (palette,
    with tRNS alpha), 4 (gray+alpha, expanded to RGBA), 6 (RGBA); bit
    depths 1/2/4/8/16; all five scanline filters; Adam7 interlace.
    Returns (h,w) gray, (h,w,3) RGB, or (h,w,4) RGBA in the stream's
    precision (uint8/uint16). tRNS on gray/RGB (color-keyed transparency)
    is ignored. Malformed streams raise ValueError (the Arrow kernels'
    error-row contract); the inflate is capped at the header-declared
    size so a crafted IDAT cannot decompression-bomb an executor."""
    import struct
    import zlib

    from spdb_spark.functions.limits import check_pixel_budget

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, ihdr, plte, trns = 8, b"", None, None, None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            if len(body) < 13:
                raise ValueError("png: truncated IHDR")
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif tag == b"IDAT":
            idat += body
        elif tag == b"PLTE":
            plte = body
        elif tag == b"tRNS":
            trns = body
        pos += 12 + length
    if ihdr is None:
        raise ValueError("png: missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if w == 0 or h == 0:
        # PNG requires nonzero dims — and expected=0 below would turn the
        # capped decompress into an UNCAPPED one (max_length=0 means
        # unlimited), reopening the zlib-bomb hole.
        raise ValueError("png: zero width or height")
    check_pixel_budget(w, h, "png")
    if comp != 0 or filt != 0:
        raise ValueError("png: unknown compression/filter method")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"png: bad color type {color_type}")
    valid_depths = {
        0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
        4: (8, 16), 6: (8, 16),
    }[color_type]
    if depth not in valid_depths:
        raise ValueError(f"png: depth {depth} invalid for color type {color_type}")
    channels = _PNG_CHANNELS[color_type]
    bpp = max(1, channels * depth // 8)

    if interlace == 0:
        passes = [(0, 0, 1, 1)]
    elif interlace == 1:
        passes = list(_ADAM7)
    else:
        raise ValueError("png: unknown interlace method")

    def pass_dims(x0, y0, dx, dy):
        return (w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy

    def pass_stride(wp):
        return (wp * channels * depth + 7) // 8

    expected = sum(
        hp * (1 + pass_stride(wp))
        for wp, hp in (pass_dims(*p) for p in passes)
        if wp and hp
    )
    try:
        raw = zlib.decompressobj().decompress(idat, expected)
    except zlib.error as e:
        raise ValueError(f"png: bad IDAT stream ({e})") from None
    if len(raw) < expected:
        raise ValueError("png: pixel data truncated")

    out = np.zeros((h, w, channels), np.uint16 if depth == 16 else np.uint8)
    off = 0
    for x0, y0, dx, dy in passes:
        wp, hp = pass_dims(x0, y0, dx, dy)
        if not wp or not hp:
            continue
        stride = pass_stride(wp)
        rows = _png_unfilter(raw[off : off + hp * (stride + 1)], hp, stride, bpp)
        off += hp * (stride + 1)
        out[y0::dy, x0::dx] = _png_samples(rows, hp, wp, channels, depth)

    if color_type == 3:
        if plte is None:
            raise ValueError("png: palette image missing PLTE")
        pal = np.frombuffer(plte, np.uint8)
        n = len(pal) // 3
        pal = pal[: n * 3].reshape(n, 3)
        idx = out[:, :, 0]
        if idx.max(initial=0) >= n:
            raise ValueError("png: palette index out of range")
        if trns is None:
            return pal[idx]
        alpha = np.full(n, 255, np.uint8)
        alpha[: min(n, len(trns))] = np.frombuffer(trns[:n], np.uint8)
        rgba = np.empty((h, w, 4), np.uint8)
        rgba[..., :3] = pal[idx]
        rgba[..., 3] = alpha[idx]
        return rgba
    if color_type == 0:
        gray = out[:, :, 0]
        if depth < 8:  # scale to full 8-bit range per the spec's guidance
            gray = (gray.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(
                np.uint8
            )
        return gray
    if color_type == 4:  # gray+alpha -> RGBA
        rgba = np.empty((h, w, 4), out.dtype)
        rgba[..., 0] = rgba[..., 1] = rgba[..., 2] = out[:, :, 0]
        rgba[..., 3] = out[:, :, 1]
        return rgba
    return out  # RGB (h,w,3) or RGBA (h,w,4)


def _palette_array() -> np.ndarray:
    """The same deterministic mod-181 RGBA palette as palette_df, as a
    (181, 4) uint8 lookup table."""
    import hashlib

    pal = np.zeros((PALETTE_SIZE, 4), dtype=np.uint8)
    for i in range(PALETTE_SIZE):
        h = hashlib.md5(f"palette:{i}".encode()).digest()
        pal[i] = (h[0], h[1], h[2], 255)
    return pal


def false_color(ids: np.ndarray) -> np.ndarray:
    """Annotation-id plane -> (H, W, 4) uint8 RGBA via the mod-181
    palette; background id 0 renders transparent black
    (annocube.py:103-160 / rgbColor semantics)."""
    pal = _palette_array()
    out = pal[(ids % PALETTE_SIZE).astype(np.int64)]
    out[ids == 0] = 0
    return out


def xy_png(v: DataFrame, z: int, t: int, x_rng, y_rng, datatype: str = "uint8") -> bytes:
    """Grayscale PNG of the XY plane (imagecube.py:104-117 xy_image).
    uint8 -> 8-bit PNG, uint16 -> 16-bit PNG."""
    dtype = {"uint8": "uint8", "uint16": "uint16"}[datatype]
    return png_encode(xy_slice(v, z, t, x_rng, y_rng, dtype=dtype))


def _z_rescale(arr: np.ndarray, z_scale: int) -> np.ndarray:
    """Anisotropy correction for z-section renders (imagecube.py:118-150
    resizes by z_scale): integer nearest-neighbor row repeat — exact and
    reversible, unlike an interpolating resize."""
    if z_scale == 1:
        return arr
    if z_scale < 1 or int(z_scale) != z_scale:
        raise ValueError(f"z_scale must be a positive integer, got {z_scale}")
    return np.repeat(arr, int(z_scale), axis=0)


def xz_png(
    v: DataFrame, y: int, t: int, x_rng, z_rng,
    datatype: str = "uint8", z_scale: int = 1,
) -> bytes:
    dtype = {"uint8": "uint8", "uint16": "uint16"}[datatype]
    return png_encode(_z_rescale(xz_slice(v, y, t, x_rng, z_rng, dtype=dtype), z_scale))


def yz_png(
    v: DataFrame, x: int, t: int, y_rng, z_rng,
    datatype: str = "uint8", z_scale: int = 1,
) -> bytes:
    dtype = {"uint8": "uint8", "uint16": "uint16"}[datatype]
    return png_encode(_z_rescale(yz_slice(v, x, t, y_rng, z_rng, dtype=dtype), z_scale))


def xy_anno_png(v: DataFrame, z: int, t: int, x_rng, y_rng) -> bytes:
    """RGBA false-color PNG of an annotation XY plane (annocube.py
    xy_image parity)."""
    return png_encode(false_color(xy_slice(v, z, t, x_rng, y_rng, dtype="uint64")))


def tile_pngs(
    v: DataFrame,
    z: int,
    t: int,
    tile_size: int = 512,
    datatype: str = "uint8",
    anno: bool = False,
) -> DataFrame:
    """Distributed tile rendering: (tile_y, tile_x, png) with the PNG
    encoded INSIDE the Arrow-batched task, one tile per group — the
    tile-server export runs fully parallel and the driver never holds
    pixel data. `anno=True` renders RGBA false color; otherwise
    grayscale at the channel datatype."""
    ts = tile_size

    def _render(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (ty, tx), g in pdf.groupby(["tile_y", "tile_x"]):
            if anno:
                ids = np.zeros((ts, ts), dtype=np.uint64)
                ids[g["yy"].to_numpy(), g["xx"].to_numpy()] = (
                    g["value"].to_numpy().astype(np.uint64)
                )
                png = png_encode(false_color(ids))
            else:
                arr = np.zeros((ts, ts), dtype=np.dtype(datatype))
                arr[g["yy"].to_numpy(), g["xx"].to_numpy()] = (
                    g["value"].to_numpy().astype(arr.dtype)
                )
                png = png_encode(arr)
            out.append((ty, tx, png))
        return pd.DataFrame(out, columns=["tile_y", "tile_x", "png"])

    plane = v.where((F.col("z") == z) & (F.col("t") == t))
    cells = plane.select(
        F.floor(F.col("y") / ts).cast("long").alias("tile_y"),
        F.floor(F.col("x") / ts).cast("long").alias("tile_x"),
        (F.col("y") % ts).cast("long").alias("yy"),
        (F.col("x") % ts).cast("long").alias("xx"),
        "value",
    )
    return cells.groupBy("tile_y", "tile_x").applyInPandas(
        _render, "tile_y long, tile_x long, png binary"
    )
