"""Derived voxel fixtures over the driver's relational testdata.

The driver correctness gate compares Spark DataFrames against DuckDB SQL on
the same parquet tables (region/nation/.../lineitem). The spatial operators
run on the engine's voxel table (SURVEY.md §1.3), so we derive a
deterministic voxel table from `lineitem` with identical arithmetic on both
engines: every spatial operator then has an exact relational oracle.

Coordinate derivation (21-bit-safe, spans a 4x4x4 cuboid grid of 512x512x16
tiles):

    t     = l_linenumber % 3
    x     = l_orderkey  % 2048
    y     = l_partkey   % 2048
    z     = l_suppkey   % 64
    value = CAST(l_quantity AS BIGINT)        -- image-ish, 1..50, never 0
    anno  = 1 + l_partkey % 20                -- annotation ids, small id space

`dedup=True` keeps one row per (t,x,y,z) via MAX(value) so merge/downsample
operators have keyed inputs (same GROUP BY on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

X_MOD, Y_MOD, Z_MOD, T_MOD = 2048, 2048, 64, 3

_BASE_EXPRS = (
    "CAST(l_linenumber % {t_mod} AS BIGINT) AS t",
    "CAST(l_orderkey % {x_mod} AS BIGINT) AS x",
    "CAST(l_partkey % {y_mod} AS BIGINT) AS y",
    "CAST(l_suppkey % {z_mod} AS BIGINT) AS z",
    "CAST({value_expr} AS BIGINT) AS value",
)

VALUE_IMAGE = "l_quantity"
VALUE_ANNO = "1 + l_partkey % 20"


def _exprs(value_expr: str) -> list[str]:
    return [
        e.format(t_mod=T_MOD, x_mod=X_MOD, y_mod=Y_MOD, z_mod=Z_MOD, value_expr=value_expr)
        for e in _BASE_EXPRS
    ]


def voxels_df(
    spark: SparkSession,
    sf_dir: str,
    value_expr: str = VALUE_IMAGE,
    dedup: bool = False,
    where: str | None = None,
) -> DataFrame:
    """Spark side of the fixture. `where` filters lineitem rows pre-derivation
    (e.g. 'l_linenumber % 2 = 0' to build the 'old' half of a merge)."""
    from spdb_spark.session import load_tables

    li = load_tables(spark, sf_dir, names=("lineitem",))["lineitem"]
    if where:
        li = li.where(where)
    v = li.selectExpr(*_exprs(value_expr))
    if dedup:
        v = v.groupBy("t", "x", "y", "z").agg({"value": "max"}).withColumnRenamed(
            "max(value)", "value"
        )
    return v


def voxels_sql(
    value_expr: str = VALUE_IMAGE,
    dedup: bool = False,
    where: str | None = None,
) -> str:
    """DuckDB side: a subquery string computing the identical voxel table."""
    cols = ",\n        ".join(_exprs(value_expr))
    where_clause = f"\n      WHERE {where}" if where else ""
    base = f"(SELECT\n        {cols}\n      FROM lineitem{where_clause})"
    if dedup:
        return (
            f"(SELECT t, x, y, z, MAX(value) AS value FROM {base} AS b"
            " GROUP BY t, x, y, z)"
        )
    return base
