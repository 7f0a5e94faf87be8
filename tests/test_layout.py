"""Layout management: Z-order writes prune scans; bucketed joins skip the
shuffle — the 100TB tactics, verified on the physical plan."""

from pyspark.sql import functions as F

from spdb_spark.plans.layout import (
    bucketed_join_plan_has_no_shuffle,
    write_bucketed,
    zorder_write,
)


def test_zorder_write_prunes_box_reads(spark, tmp_path):
    from spdb_spark.fixtures import voxels_df
    from spdb_spark.operators.voxel import cutout

    path = str(tmp_path / "zvox")
    zorder_write(voxels_df(spark, "/root/testdata/sf0.001"), path, num_files=8)
    df = spark.read.parquet(path)
    out = cutout(df, (0, 0, 0), (256, 256, 8))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "LessThan(x,256)" in plan
    assert out.count() > 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        orders_raw = spark.range(0, 1500).select(
            F.col("id").alias("o_orderkey"), (F.col("id") % 7).alias("o_flag")
        )
        write_bucketed(
            li.select("l_orderkey", "l_quantity"), "li_b", ["l_orderkey"], 8
        )
        write_bucketed(orders_raw, "ord_b", ["o_orderkey"], 8)
        a = spark.table("li_b")
        b = spark.table("ord_b")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        assert joined.count() > 0
        assert bucketed_join_plan_has_no_shuffle(joined)
        # sanity: the same join on unbucketed inputs DOES shuffle
        unbucketed = li.select("l_orderkey", "l_quantity").join(
            orders_raw, F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert not bucketed_join_plan_has_no_shuffle(unbucketed)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
