"""Block (cuboid) blob codec: dense ndarray <-> compressed bytes, and
block <-> voxel conversion kernels used via ``mapInPandas``.

Replaces the reference's blosc pack/unpack (cube.py:127-262) with
zlib-over-C-order-bytes plus a tiny self-describing header. A cuboid blob
holds ONE time sample as a C-ordered [z, y, x] array of the channel dtype
(reference layout [t, z, y, x], cube.py:51-58, with t always 1 per stored
object — spatialdb.py:806-826 slices writes per time sample).

All bulk paths are Arrow-batched (mapInPandas): Python runs once per batch of
cuboids, numpy does the per-voxel work — never row-at-a-time Python.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from spdb_spark.constants import CUBOID_SIZE

_MAGIC = b"SPB1"
_DTYPE_CODES = {"uint8": 1, "uint16": 2, "uint32": 3, "uint64": 4}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}
# header: magic, dtype code, zdim, ydim, xdim
_HEADER = struct.Struct("<4sBHHH")


def pack_array(arr: np.ndarray, level: int = 1) -> bytes:
    """Compress one [z, y, x] C-order ndarray into a blob."""
    if arr.ndim != 3:
        raise ValueError(f"expected [z,y,x] 3-d array, got shape {arr.shape}")
    code = _DTYPE_CODES[arr.dtype.name]
    z, y, x = arr.shape
    header = _HEADER.pack(_MAGIC, code, z, y, x)
    return header + zlib.compress(np.ascontiguousarray(arr).tobytes(), level)


def unpack_array(blob: bytes) -> np.ndarray:
    """Decompress a blob back into a [z, y, x] ndarray."""
    magic, code, z, y, x = _HEADER.unpack_from(blob)
    if magic != _MAGIC:
        raise ValueError("bad blob magic")
    dtype = np.dtype(_CODE_DTYPES[code])
    raw = zlib.decompress(blob[_HEADER.size:])
    return np.frombuffer(raw, dtype=dtype).reshape(z, y, x)


def blob_dtype(blob: bytes) -> str:
    return _CODE_DTYPES[_HEADER.unpack_from(blob)[1]]


# ---------------------------------------------------------------------------
# mapInPandas kernels
# ---------------------------------------------------------------------------

# Max voxel rows per yielded pandas frame: bounds the Arrow batch a task
# sends back (a DENSE cuboid decodes to 4.2M rows ~ 250MB as one batch;
# several concurrent tasks at that size exhaust the JVM direct-memory pool).
_MAX_ROWS_PER_CHUNK = 512 * 512 * 4


def blocks_to_voxels(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: block rows -> voxel rows (zero-suppressed).

    Input columns: lookup_key, resolution, t, x_idx, y_idx, z_idx, blob.
    Output columns: lookup_key, resolution, t, x, y, z, value.

    Yields one bounded chunk at a time (never concatenates cuboids):
    per-task memory stays O(one cuboid), whatever the partition holds.
    """
    cx, cy, cz = CUBOID_SIZE
    for pdf in batches:
        for row in pdf.itertuples(index=False):
            arr = unpack_array(row.blob)
            zz, yy, xx = np.nonzero(arr)
            n = len(zz)
            if n == 0:
                continue
            vals = arr[zz, yy, xx].astype(np.int64)
            for lo in range(0, n, _MAX_ROWS_PER_CHUNK):
                hi = min(lo + _MAX_ROWS_PER_CHUNK, n)
                yield pd.DataFrame(
                    {
                        "lookup_key": row.lookup_key,
                        "resolution": np.int32(row.resolution),
                        "t": np.int64(row.t),
                        "x": xx[lo:hi].astype(np.int64) + row.x_idx * cx,
                        "y": yy[lo:hi].astype(np.int64) + row.y_idx * cy,
                        "z": zz[lo:hi].astype(np.int64) + row.z_idx * cz,
                        "value": vals[lo:hi],
                    }
                )


def make_merge_voxels_to_blocks(dtype: str, mode: str):
    """Fused merge+pack kernel: one applyInPandas group = ONE cuboid's
    voxels from BOTH sides (column `side`: 'o' stored / 'n' incoming),
    materialized as dense arrays and overlaid with the reference's dense
    semantics (overwriteDense.c / exceptionDense.c / cube.py to_black),
    then packed to a blob. Replaces full-outer-join merge + re-block
    groupBy — three voxel-volume exchanges — with a single exchange on
    the cuboid key. Inputs are zero-suppressed voxel rows (the decode
    kernel emits no zeros), so 'old wins where present' == 'old != 0'.
    A merge that empties the cuboid emits nothing (the cuboid's block
    row disappears, matching the voxel-path behavior)."""
    np_dtype = np.dtype(dtype)
    cx, cy, cz = CUBOID_SIZE
    if mode not in ("overwrite", "exception", "to_black"):
        raise ValueError(f"bad merge mode {mode!r}")

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        lookup_key, resolution, t, x_idx, y_idx, z_idx = key
        old = np.zeros((cz, cy, cx), dtype=np_dtype)
        new = np.zeros((cz, cy, cx), dtype=np_dtype)
        for side, arr in (("o", old), ("n", new)):
            g = pdf[pdf["side"] == side]
            if len(g):
                arr[
                    g["z"].to_numpy() - z_idx * cz,
                    g["y"].to_numpy() - y_idx * cy,
                    g["x"].to_numpy() - x_idx * cx,
                ] = g["value"].to_numpy().astype(np_dtype)
        if mode == "overwrite":
            out = np.where(new != 0, new, old)
        elif mode == "exception":
            out = np.where(old != 0, old, new)
        else:  # to_black: erase where the mask is exactly 1
            out = np.where(new == np_dtype.type(1), np_dtype.type(0), old)
        if not out.any():
            return pd.DataFrame(
                {
                    "lookup_key": pd.Series([], dtype=object),
                    "resolution": pd.Series([], dtype="int32"),
                    "t": pd.Series([], dtype="int64"),
                    "morton": pd.Series([], dtype="int64"),
                    "x_idx": pd.Series([], dtype="int32"),
                    "y_idx": pd.Series([], dtype="int32"),
                    "z_idx": pd.Series([], dtype="int32"),
                    "blob": pd.Series([], dtype=object),
                }
            )
        from spdb_spark.morton import xyz_morton

        return pd.DataFrame(
            {
                "lookup_key": [lookup_key],
                "resolution": [np.int32(resolution)],
                "t": [np.int64(t)],
                "morton": [np.int64(xyz_morton(x_idx, y_idx, z_idx))],
                "x_idx": [np.int32(x_idx)],
                "y_idx": [np.int32(y_idx)],
                "z_idx": [np.int32(z_idx)],
                "blob": [pack_array(out)],
            }
        )

    return kernel


def make_voxels_to_blocks(dtype: str):
    """Build a mapInPandas kernel packing voxel rows into cuboid blobs.

    Expects input pre-grouped so one cuboid's voxels never span partitions
    (use groupBy(cuboid key).applyInPandas or repartition+sortWithinPartitions
    upstream). Input columns: lookup_key, resolution, t, x, y, z, value.
    """
    np_dtype = np.dtype(dtype)
    cx, cy, cz = CUBOID_SIZE

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        lookup_key, resolution, t, x_idx, y_idx, z_idx = key
        arr = np.zeros((cz, cy, cx), dtype=np_dtype)
        lx = pdf["x"].to_numpy() - x_idx * cx
        ly = pdf["y"].to_numpy() - y_idx * cy
        lz = pdf["z"].to_numpy() - z_idx * cz
        arr[lz, ly, lx] = pdf["value"].to_numpy().astype(np_dtype)
        from spdb_spark.morton import xyz_morton

        return pd.DataFrame(
            {
                "lookup_key": [lookup_key],
                "resolution": [np.int32(resolution)],
                "t": [np.int64(t)],
                "morton": [np.int64(xyz_morton(x_idx, y_idx, z_idx))],
                "x_idx": [np.int32(x_idx)],
                "y_idx": [np.int32(y_idx)],
                "z_idx": [np.int32(z_idx)],
                "blob": [pack_array(arr)],
            }
        )

    return kernel
