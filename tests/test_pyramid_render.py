"""Resolution-pyramid materialization + slice/recolor presentation ops."""

import numpy as np
from pyspark.sql import functions as F

from spdb_spark.store import CuboidStore


def test_build_pyramid_image_avg(spark, tmp_path):
    store = CuboidStore(spark, str(tmp_path / "img"), datatype="uint8")
    data = np.zeros((16, 512, 512), dtype="uint8")
    data[:, 0:2, 0:2] = 100  # one 2x2 block -> one level-1 voxel of 100
    data[:, 10:12, 10] = 40  # half-filled window -> avg 20 over the pair? no:
    # window (y 10-11, x 10-11) has two voxels of 40 and two zeros -> but
    # zeros are suppressed, avg over PRESENT voxels = 40
    store.write_cuboid(data, (0, 0, 0))
    store.build_pyramid(2, channel_type="image", method="avg")
    lvl1 = store.cutout((0, 0, 0), (256, 256, 16), resolution=1)[0]
    assert (lvl1[:, 0, 0] == 100).all()
    assert (lvl1[:, 5, 5] == 40).all()


def test_build_pyramid_annotation_getannvalue(spark, tmp_path):
    store = CuboidStore(spark, str(tmp_path / "anno"), datatype="uint64")
    data = np.zeros((16, 512, 512), dtype="uint64")
    # v00=1 v01=2 v10=2 v11=2 -> getAnnValue picks 2 (v10 matches v01)
    data[0, 0, 0] = 1
    data[0, 0, 1] = 2
    data[0, 1, 0] = 2
    data[0, 1, 1] = 2
    # lone v11 at window (y 2-3, x 2-3): quirk -> background
    data[0, 3, 3] = 9
    store.write_cuboid(data, (0, 0, 0))
    store.build_pyramid(2, channel_type="annotation")
    lvl1 = store.cutout((0, 0, 0), (256, 256, 16), resolution=1)[0]
    assert lvl1[0, 0, 0] == 2
    assert lvl1[0, 1, 1] == 0  # the lone-v11 quirk propagates through storage


def test_slices_and_recolor(spark):
    from spdb_spark.operators.render import recolor, xy_slice, xz_slice, yz_slice

    v = spark.createDataFrame(
        [(0, 5, 6, 7, 42), (0, 5, 8, 7, 360 + 42), (0, 5, 6, 9, 7)],
        "t long, x long, y long, z long, value long",
    )
    xy = xy_slice(v, z=7, t=0, x_rng=(0, 10), y_rng=(0, 10))
    assert xy[6, 5] == 42 and xy[8, 5] == 402 and xy.sum() == 444
    xz = xz_slice(v, y=6, t=0, x_rng=(0, 10), z_rng=(0, 10))
    assert xz[7, 5] == 42 and xz[9, 5] == 7
    yz = yz_slice(v, x=5, t=0, y_rng=(0, 10), z_rng=(0, 10))
    assert yz[7, 6] == 42 and yz[7, 8] == 402

    rec = recolor(v).collect()
    by_val = {r.value: (r.r, r.g, r.b, r.a) for r in rec}
    # ids congruent mod 181 share palette colors (42 and 402 -> 402%181=40, 42%181=42)
    assert by_val[42][3] == 255
    rec2 = recolor(
        spark.createDataFrame([(0, 1, 1, 1, 42 + 181)], "t long, x long, y long, z long, value long")
    ).collect()[0]
    assert (rec2.r, rec2.g, rec2.b) == by_val[42][:3]


def test_recolor_background_transparent(spark):
    from spdb_spark.operators.render import recolor

    v = spark.createDataFrame([(0, 1, 1, 1, 0)], "t long, x long, y long, z long, value long")
    r = recolor(v).collect()[0]
    assert (r.r, r.g, r.b, r.a) == (0, 0, 0, 0)
