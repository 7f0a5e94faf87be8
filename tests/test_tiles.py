"""Tile export: dense payloads must re-assemble the exact xy_slice, and
the manifest must describe the payloads (count/sum/non-empty parity)."""

import numpy as np

from spdb_spark.fixtures import voxels_df
from spdb_spark.operators.render import tile_grid, tile_payloads, xy_slice

Z, T, TS = 8, 0, 128


def _voxels(spark):
    return voxels_df(spark, "/root/testdata/sf0.001", dedup=True)


def test_payloads_reassemble_slice(spark):
    v = _voxels(spark)
    tiles = {
        (r.tile_y, r.tile_x): np.frombuffer(r.payload, dtype="<u8").reshape(TS, TS)
        for r in tile_payloads(v, Z, T, tile_size=TS).collect()
    }
    assert tiles  # plane is non-empty at this z/t
    max_ty = max(ty for ty, _ in tiles)
    max_tx = max(tx for _, tx in tiles)
    h, w = (max_ty + 1) * TS, (max_tx + 1) * TS
    assembled = np.zeros((h, w), dtype="uint64")
    for (ty, tx), arr in tiles.items():
        assembled[ty * TS : (ty + 1) * TS, tx * TS : (tx + 1) * TS] = arr
    direct = xy_slice(v, Z, T, (0, w), (0, h))
    np.testing.assert_array_equal(assembled, direct)


def test_manifest_describes_payloads(spark):
    v = _voxels(spark)
    manifest = {
        (r.tile_y, r.tile_x): (r.n_voxels, r.sum_value)
        for r in tile_grid(v, Z, T, tile_size=TS).collect()
    }
    payloads = {
        (r.tile_y, r.tile_x): np.frombuffer(r.payload, dtype="<u8")
        for r in tile_payloads(v, Z, T, tile_size=TS).collect()
    }
    assert manifest.keys() == payloads.keys()
    for key, arr in payloads.items():
        n, s = manifest[key]
        # fixture voxels are all non-zero, so dense non-zeros == cell count
        assert int((arr != 0).sum()) == n
        assert int(arr.sum()) == s
