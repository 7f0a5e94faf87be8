"""Presentation operators: plane slices and annotation recoloring
(reference: imagecube.py:104-300 xy/xz/yz_image, recolorCube.c + rgbColor.py).

Slices are plain filters (distributed until the final driver-side reshape);
recolor maps annotation ids to stable RGBA via a broadcast palette. The
reference uses a fixed 181-entry palette keyed `id % 181`
(ndlib.py:247-261); we keep the mod-181 keying but generate the palette
deterministically from the portable hash instead of copying the table."""

from __future__ import annotations

import numpy as np
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

    def _pack(pdf):
        import pandas as pd

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
