"""Scale stress: synthesize a ~16M-voxel volume spanning a 4x4x4 cuboid
grid (64 tiles), lay it out Z-ordered, and time the core read/aggregate
operators plus the block-path store on realistic cuboid counts.

Usage: python tools/stress_scale.py [sf_dir] [multiplier]
Prints one JSON line with timings; used to sanity-check that operator
wall-clock scales with data touched (pruning works), not table size.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 27

    from spdb_spark.fixtures import voxels_df
    from spdb_spark.operators import voxel as V
    from spdb_spark.plans.layout import zorder_write
    from spdb_spark.session import get_spark

    spark = get_spark("stress_scale")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = "/tmp/spdb_stress"
    path = f"{out_dir}/zvox"

    timings = {}

    def timed(label, f):
        t0 = time.perf_counter()
        r = f()
        timings[label] = round(time.perf_counter() - t0, 3)
        return r

    # ~600k base voxels x mult replicas, shifted into distinct cuboids
    base = voxels_df(spark, sf_dir)
    k = round(mult ** (1 / 3))
    big = (
        base.crossJoin(
            spark.range(k).select(F.col("id").alias("ox"))
        )
        .crossJoin(spark.range(k).select(F.col("id").alias("oy")))
        .crossJoin(spark.range(k).select(F.col("id").alias("oz")))
        .select(
            "t",
            (F.col("x") + F.col("ox") * 2048).alias("x"),
            (F.col("y") + F.col("oy") * 2048).alias("y"),
            (F.col("z") + F.col("oz") * 64).alias("z"),
            "value",
        )
    )
    n = timed("build_and_zorder_write", lambda: zorder_write(big, path, num_files=32))
    df = spark.read.parquet(path)
    timings["n_voxels"] = timed("full_count", lambda: df.count())

    timed(
        "cutout_small_box",
        lambda: V.cutout(df, (2100, 2100, 70), (512, 512, 16)).count(),
    )
    timed(
        "cutout_large_box",
        lambda: V.cutout(df, (0, 0, 0), (4096, 4096, 128)).count(),
    )
    timed("ids_in_region", lambda: V.ids_in_region(df, (0, 0, 0), (4096, 4096, 128)).count())
    timed("tight_bbox", lambda: V.tight_bounding_box(df, 41).collect())
    timed(
        "downsample_avg_full",
        lambda: V.downsample_image_avg(df).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "downsample_anno_full",
        lambda: V.downsample_annotation(
            df.groupBy("t", "x", "y", "z").agg(F.max("value").alias("value"))
        ).write.format("noop").mode("overwrite").save(),
    )
    timed(
        "cuboid_agg_full",
        lambda: V.with_cuboid_coords(df)
        .groupBy("morton")
        .agg(F.count("*").alias("n"))
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    # --- block-path store: bulk ingest, then windowed cutout vs voxel path --
    import shutil

    from spdb_spark.sources.volumetric import ingest_voxel_files
    from spdb_spark.store import CuboidStore

    vox_files = f"{out_dir}/vox_files"
    store_path = f"{out_dir}/store"
    shutil.rmtree(vox_files, ignore_errors=True)
    shutil.rmtree(store_path, ignore_errors=True)
    df.withColumn("t", F.col("t").cast("long")).write.parquet(vox_files)
    store = CuboidStore(spark, store_path, datatype="uint8")
    timed("block_ingest", lambda: ingest_voxel_files(store, vox_files))
    timed(
        "block_cutout_small_box",
        lambda: store.cutout_voxels((2100, 2100, 70), (512, 512, 16)).count(),
    )
    timed(
        "block_cutout_large_box",
        lambda: store.cutout_voxels((0, 0, 0), (4096, 4096, 128)).count(),
    )
    # dense ndarray assembly (driver collect) of one cuboid-aligned window
    timed(
        "block_cutout_dense_1cuboid",
        lambda: store.cutout((2048, 2048, 64), (512, 512, 16)).sum(),
    )

    print(json.dumps({"multiplier": mult, **timings}))
    spark.stop()


if __name__ == "__main__":
    main()
