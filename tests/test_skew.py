"""Skew tools: salted join/count correctness; HLL accuracy bound."""

from pyspark.sql import functions as F

from spdb_spark.operators.skew import approx_distinct_ids, salted_count, salted_join


def test_salted_join_equals_plain_join(spark, tables):
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    orders = tables["orders"].select("o_orderkey", "o_orderpriority")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    salted = salted_join(
        li.withColumnRenamed("l_orderkey", "k"),
        orders.withColumnRenamed("o_orderkey", "k"),
        on=["k"],
        n_salts=4,
    ).count()
    assert salted == plain


def test_salted_count_equals_plain_count(spark, tables):
    li = tables["lineitem"]
    plain = {
        (r.l_returnflag, r.n)
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    salted = {
        (r.l_returnflag, r.n) for r in salted_count(li, ["l_returnflag"]).collect()
    }
    assert salted == plain


def test_approx_distinct_within_rsd(spark, sf_dir="/root/testdata/sf0.01"):
    from spdb_spark.fixtures import VALUE_ANNO, voxels_df

    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO)
    exact = v.where(F.col("value") != 0).select("value").distinct().count()
    approx = approx_distinct_ids(v).collect()[0].approx_n_ids
    assert abs(approx - exact) / exact < 0.1
