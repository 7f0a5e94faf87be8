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


def test_png_roundtrip_gray8_gray16_rgba():
    from spdb_spark.operators.render import png_decode, png_encode

    rng = np.random.default_rng(7)
    g8 = rng.integers(0, 256, size=(37, 53), dtype=np.uint16).astype(np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(g8)), g8)
    g16 = rng.integers(0, 65536, size=(19, 23), dtype=np.uint32).astype(np.uint16)
    np.testing.assert_array_equal(png_decode(png_encode(g16)), g16)
    rgba = rng.integers(0, 256, size=(11, 13, 4), dtype=np.uint16).astype(np.uint8)
    np.testing.assert_array_equal(png_decode(png_encode(rgba)), rgba)


def test_false_color_matches_recolor_operator(spark):
    """The numpy false-color palette must agree with the distributed
    recolor operator's broadcast palette (same mod-181 RGBA mapping,
    background 0 transparent)."""
    from spdb_spark.operators.render import false_color, recolor

    ids = np.array([[0, 1, 180], [181, 182, 999]], dtype=np.uint64)
    rows = [
        (0, int(x), int(y), 0, int(ids[y, x]))
        for y in range(2)
        for x in range(3)
    ]
    v = spark.createDataFrame(rows, "t long, x long, y long, z long, value long")
    got = {
        (r.y, r.x): (r.r, r.g, r.b, r.a) for r in recolor(v).collect()
    }
    fc = false_color(ids)
    for y in range(2):
        for x in range(3):
            assert tuple(int(c) for c in fc[y, x]) == got[(y, x)]


def test_xy_anno_png_roundtrip(spark):
    from spdb_spark.operators.render import (
        false_color,
        png_decode,
        xy_anno_png,
        xy_slice,
    )

    v = _voxels(spark)
    rng = ((0, 256), (0, 256))
    png = xy_anno_png(v, Z, T, rng[0], rng[1])
    expect = false_color(xy_slice(v, Z, T, rng[0], rng[1], dtype="uint64"))
    np.testing.assert_array_equal(png_decode(png), expect)


def test_tile_pngs_reassemble_slice(spark):
    """Distributed per-tile PNG render decodes back to the exact plane,
    both grayscale and false-color."""
    from spdb_spark.operators.render import false_color, png_decode, tile_pngs

    v = _voxels(spark)
    # fixture values are 1..50 -> uint8-safe
    tiles = {
        (r.tile_y, r.tile_x): png_decode(r.png)
        for r in tile_pngs(v, Z, T, tile_size=TS, datatype="uint8").collect()
    }
    assert tiles
    direct = xy_slice(
        v,
        Z,
        T,
        (0, (max(tx for _, tx in tiles) + 1) * TS),
        (0, (max(ty for ty, _ in tiles) + 1) * TS),
    ).astype(np.uint8)
    for (ty, tx), arr in tiles.items():
        np.testing.assert_array_equal(
            arr, direct[ty * TS : (ty + 1) * TS, tx * TS : (tx + 1) * TS]
        )

    anno_tiles = {
        (r.tile_y, r.tile_x): png_decode(r.png)
        for r in tile_pngs(v, Z, T, tile_size=TS, anno=True).collect()
    }
    full = false_color(direct.astype(np.uint64))
    for (ty, tx), arr in anno_tiles.items():
        np.testing.assert_array_equal(
            arr, full[ty * TS : (ty + 1) * TS, tx * TS : (tx + 1) * TS]
        )


def test_xz_png_z_scale_repeats_rows(spark):
    """Anisotropy correction (imagecube.py z_scale resize): each z row
    repeats z_scale times, exactly."""
    from spdb_spark.operators.render import png_decode, xz_png, xz_slice

    v = _voxels(spark)
    base = xz_slice(v, 8, T, (0, 128), (0, 16), dtype="uint8")
    scaled = png_decode(xz_png(v, 8, T, (0, 128), (0, 16), z_scale=4))
    assert scaled.shape == (base.shape[0] * 4, base.shape[1])
    np.testing.assert_array_equal(scaled, np.repeat(base, 4, axis=0))


def test_tile_pngs_uint16(spark):
    """16-bit grayscale tile render round-trips (imagecube.py:231-300
    ImageCube16 parity)."""
    from spdb_spark.operators.render import png_decode, tile_pngs

    v = _voxels(spark)  # values 1..50 fit any width
    tiles = {
        (r.tile_y, r.tile_x): png_decode(r.png)
        for r in tile_pngs(v, Z, T, tile_size=TS, datatype="uint16").collect()
    }
    assert tiles
    direct = xy_slice(
        v,
        Z,
        T,
        (0, (max(tx for _, tx in tiles) + 1) * TS),
        (0, (max(ty for ty, _ in tiles) + 1) * TS),
    ).astype(np.uint16)
    for (ty, tx), arr in tiles.items():
        assert arr.dtype == np.uint16
        np.testing.assert_array_equal(
            arr, direct[ty * TS : (ty + 1) * TS, tx * TS : (tx + 1) * TS]
        )
