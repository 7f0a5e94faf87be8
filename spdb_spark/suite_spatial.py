"""Spatial operator suite: (Spark callable, DuckDB oracle SQL) pairs.

Each entry runs an engine operator (spdb_spark.operators.voxel) over the
derived voxel fixture (spdb_spark.fixtures) and pairs it with ANSI SQL
computing the identical result on the same lineitem parquet, so the driver's
DuckDB gate checks exact semantics — including the reference's
order-dependent getAnnValue tie-breaking (addData.c:28-48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spdb_spark.constants import CUBOID_X, CUBOID_Y, CUBOID_Z
from spdb_spark.fixtures import (
    T_MOD,
    VALUE_ANNO,
    VALUE_IMAGE,
    X_MOD,
    Y_MOD,
    Z_MOD,
    voxels_df,
    voxels_sql,
)

# Region extents of the derived voxel fixture (fixtures.py coordinate
# mods): lets the morphology gates use the packed single-long position
# key — the bounds a real cutout request always carries.
FIXTURE_BOUNDS = (T_MOD, X_MOD, Y_MOD, Z_MOD)
from spdb_spark.morton import morton_encode_sql
from spdb_spark.operators import voxel as V

# Canonical test parameters: unaligned corner, extents crossing multiple
# cuboid boundaries in every axis, non-empty at every scale factor (sf0.001
# derived y only reaches ~200, so the box must start below that).
BOX_CORNER = (128, 64, 4)
BOX_EXTENT = (1280, 1024, 32)
T_RANGE = (0, 2)
FILTER_IDS = (5, 10, 15, 20, 25, 41)
ANNO_ID = 7
ANNOTATE_ID = 999

_OLD_WHERE = "l_linenumber % 2 = 0"
_NEW_WHERE = "l_linenumber % 2 = 1"


def _box_sql(corner=BOX_CORNER, extent=BOX_EXTENT, t_range=None) -> str:
    (x0, y0, z0), (dx, dy, dz) = corner, extent
    p = (
        f"x >= {x0} AND x < {x0 + dx} AND y >= {y0} AND y < {y0 + dy}"
        f" AND z >= {z0} AND z < {z0 + dz}"
    )
    if t_range is not None:
        p += f" AND t >= {t_range[0]} AND t < {t_range[1]}"
    return p


def _ann_value_sql(inner: str) -> str:
    """getAnnValue (addData.c:28-48) as a staged CASE cascade, quirk included
    (v11-step assigns v10 when running value is 0)."""
    return f"""
        SELECT t, x, y, z,
               CASE WHEN v11 <> 0 AND b = 0 THEN v10
                    WHEN v11 <> 0 AND (v11 = v00 OR v11 = v01 OR v11 = v10) THEN v11
                    ELSE b END AS value
        FROM (
          SELECT *, CASE WHEN v10 <> 0 AND a = 0 THEN v10
                         WHEN v10 <> 0 AND (v10 = v00 OR v10 = v01) THEN v10
                         ELSE a END AS b
          FROM (
            SELECT *, CASE WHEN v00 = 0 THEN v01 ELSE v00 END AS a
            FROM ({inner})
          )
        )"""


def _corner_sql(xs: int, ys: int, zsel: str, zs: int) -> str:
    zcond = f" AND ({zsel}) = {zs}" if zsel else ""
    return (
        f"COALESCE(MAX(CASE WHEN (x % 2) = {xs} AND (y % 2) = {ys}{zcond}"
        f" THEN value END), 0)"
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_spatial_cutout(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir)
    return V.cutout(v, BOX_CORNER, BOX_EXTENT, T_RANGE)


SQL_SPATIAL_CUTOUT = f"""
SELECT t, x, y, z, value FROM {voxels_sql()} AS v
WHERE {_box_sql(t_range=T_RANGE)}
"""


def q_spatial_cutout_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir)
    return V.cutout(v, BOX_CORNER, BOX_EXTENT, filter_ids=FILTER_IDS)


SQL_SPATIAL_CUTOUT_FILTERED = f"""
SELECT t, x, y, z, value FROM {voxels_sql()} AS v
WHERE {_box_sql()} AND value IN {tuple(FILTER_IDS)}
"""


def q_spatial_cuboid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cuboid decomposition + Morton addressing: per-cuboid row/value stats
    (the planning step of cutout, spatialdb.py:451-475, exercised as data)."""
    v = V.with_cuboid_coords(voxels_df(spark, sf_dir))
    return (
        v.groupBy("morton", "x_idx", "y_idx", "z_idx")
        .agg(
            F.count("*").alias("n_vox"),
            F.sum("value").alias("sum_val"),
            F.max("value").alias("max_val"),
        )
    )


SQL_SPATIAL_CUBOID_AGG = f"""
SELECT {morton_encode_sql('x_idx', 'y_idx', 'z_idx')} AS morton,
       x_idx, y_idx, z_idx,
       COUNT(*) AS n_vox,
       CAST(SUM(value) AS BIGINT) AS sum_val,
       MAX(value) AS max_val
FROM (
  SELECT (x // {CUBOID_X}) AS x_idx, (y // {CUBOID_Y}) AS y_idx,
         (z // {CUBOID_Z}) AS z_idx, value
  FROM {voxels_sql()} AS v
)
GROUP BY x_idx, y_idx, z_idx
"""


def q_spatial_ids_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO)
    return V.ids_in_region(v, BOX_CORNER, BOX_EXTENT)


SQL_SPATIAL_IDS_IN_REGION = f"""
SELECT DISTINCT value AS id FROM {voxels_sql(value_expr=VALUE_ANNO)} AS v
WHERE {_box_sql()} AND value <> 0
"""


def q_spatial_tight_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO)
    return V.tight_bounding_box(v, ANNO_ID)


SQL_SPATIAL_TIGHT_BBOX = f"""
SELECT MIN(x) AS x_min, MAX(x) AS x_max,
       MIN(y) AS y_min, MAX(y) AS y_max,
       MIN(z) AS z_min, MAX(z) AS z_max
FROM {voxels_sql(value_expr=VALUE_ANNO)} AS v WHERE value = {ANNO_ID}
"""


def q_spatial_loose_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO)
    return V.loose_bounding_box(v, ANNO_ID)


SQL_SPATIAL_LOOSE_BBOX = f"""
SELECT (MIN(x) // {CUBOID_X}) * {CUBOID_X} AS x_min,
       ((MAX(x) // {CUBOID_X}) + 1) * {CUBOID_X} - 1 AS x_max,
       (MIN(y) // {CUBOID_Y}) * {CUBOID_Y} AS y_min,
       ((MAX(y) // {CUBOID_Y}) + 1) * {CUBOID_Y} - 1 AS y_max,
       (MIN(z) // {CUBOID_Z}) * {CUBOID_Z} AS z_min,
       ((MAX(z) // {CUBOID_Z}) + 1) * {CUBOID_Z} - 1 AS z_max
FROM {voxels_sql(value_expr=VALUE_ANNO)} AS v WHERE value = {ANNO_ID}
"""


def q_spatial_cuboid_id_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO)
    return V.cuboid_id_index(v)


SQL_SPATIAL_CUBOID_ID_INDEX = f"""
SELECT DISTINCT {morton_encode_sql(f'(x // {CUBOID_X})', f'(y // {CUBOID_Y})', f'(z // {CUBOID_Z})')} AS morton,
       value AS id
FROM {voxels_sql(value_expr=VALUE_ANNO)} AS v WHERE value <> 0
"""


def q_spatial_cuboids_with_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO)
    return V.cuboids_containing_id(v, ANNO_ID)


SQL_SPATIAL_CUBOIDS_WITH_ID = f"""
SELECT DISTINCT {morton_encode_sql(f'(x // {CUBOID_X})', f'(y // {CUBOID_Y})', f'(z // {CUBOID_Z})')} AS morton
FROM {voxels_sql(value_expr=VALUE_ANNO)} AS v WHERE value = {ANNO_ID}
"""


# --- merge family ---------------------------------------------------------

def _old_new(spark, sf_dir, value_expr=VALUE_IMAGE):
    old = voxels_df(spark, sf_dir, value_expr=value_expr, dedup=True, where=_OLD_WHERE)
    new = voxels_df(spark, sf_dir, value_expr=value_expr, dedup=True, where=_NEW_WHERE)
    return old, new


_SQL_OLD = voxels_sql(dedup=True, where=_OLD_WHERE)
_SQL_NEW = voxels_sql(dedup=True, where=_NEW_WHERE)


def q_spatial_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _old_new(spark, sf_dir)
    return V.overwrite_merge(old, new)


SQL_SPATIAL_OVERWRITE = f"""
SELECT COALESCE(o.t, n.t) AS t, COALESCE(o.x, n.x) AS x,
       COALESCE(o.y, n.y) AS y, COALESCE(o.z, n.z) AS z,
       COALESCE(NULLIF(n.value, 0), o.value, 0) AS value
FROM {_SQL_OLD} AS o
FULL OUTER JOIN {_SQL_NEW} AS n
  ON o.t = n.t AND o.x = n.x AND o.y = n.y AND o.z = n.z
WHERE COALESCE(NULLIF(n.value, 0), o.value, 0) <> 0
"""


def q_spatial_exception_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _old_new(spark, sf_dir)
    return V.exception_merge(old, new)


SQL_SPATIAL_EXCEPTION_MERGE = f"""
SELECT COALESCE(o.t, n.t) AS t, COALESCE(o.x, n.x) AS x,
       COALESCE(o.y, n.y) AS y, COALESCE(o.z, n.z) AS z,
       COALESCE(o.value, n.value, 0) AS value
FROM {_SQL_OLD} AS o
FULL OUTER JOIN {_SQL_NEW} AS n
  ON o.t = n.t AND o.x = n.x AND o.y = n.y AND o.z = n.z
WHERE COALESCE(o.value, n.value, 0) <> 0
"""


def q_spatial_overwrite_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-shuffle form of the overwrite merge (tag-union + one
    groupBy; absorbs the fixture's MAX-dedup) checked against the SAME
    oracle as the join form — output identical by construction."""
    old = voxels_df(spark, sf_dir, dedup=False, where=_OLD_WHERE)
    new = voxels_df(spark, sf_dir, dedup=False, where=_NEW_WHERE)
    return V.overwrite_merge_union(old, new)


def q_spatial_exception_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-shuffle fill-only merge — same oracle as the join form."""
    old = voxels_df(spark, sf_dir, dedup=False, where=_OLD_WHERE)
    new = voxels_df(spark, sf_dir, dedup=False, where=_NEW_WHERE)
    return V.exception_merge_union(old, new)


def q_spatial_to_black(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cutout-to-black erase (reference cube.py:264-291, write path
    spatialdb.py:793-801): zero old voxels wherever the mask holds 1 —
    the merge mode that previously had only a byte-identity test. The
    mask here is PARTIAL (new value parity), so the result differs from
    shave's erase-everywhere-nonzero and pins the ==1 mask contract."""
    old, new = _old_new(spark, sf_dir)
    mask = new.withColumn(
        "value", (F.col("value") % 2).cast(new.schema["value"].dataType)
    )
    return V.overwrite_to_black(old, mask)


SQL_SPATIAL_TO_BLACK = f"""
SELECT o.t, o.x, o.y, o.z, o.value FROM {_SQL_OLD} AS o
WHERE NOT EXISTS (
  SELECT 1 FROM {_SQL_NEW} AS n
  WHERE n.value % 2 = 1 AND n.t = o.t AND n.x = o.x AND n.y = o.y AND n.z = o.z
)
"""


def q_spatial_shave(spark: SparkSession, sf_dir: str) -> DataFrame:
    old, new = _old_new(spark, sf_dir)
    return V.shave_merge(old, new)


SQL_SPATIAL_SHAVE = f"""
SELECT o.t, o.x, o.y, o.z, o.value FROM {_SQL_OLD} AS o
WHERE NOT EXISTS (
  SELECT 1 FROM {_SQL_NEW} AS n
  WHERE n.value <> 0 AND n.t = o.t AND n.x = o.x AND n.y = o.y AND n.z = o.z
)
"""


def q_spatial_annotate_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    data = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True, where=_OLD_WHERE)
    locs = voxels_df(spark, sf_dir, dedup=True, where=_NEW_WHERE).select("t", "x", "y", "z")
    result, _ = V.annotate(data, locs, ANNOTATE_ID, conflict="O")
    return result


_SQL_ANNO_OLD = voxels_sql(value_expr=VALUE_ANNO, dedup=True, where=_OLD_WHERE)
_SQL_LOCS = f"(SELECT DISTINCT t, x, y, z FROM {voxels_sql(dedup=True, where=_NEW_WHERE)} AS q)"

SQL_SPATIAL_ANNOTATE_OVERWRITE = f"""
SELECT COALESCE(d.t, l.t) AS t, COALESCE(d.x, l.x) AS x,
       COALESCE(d.y, l.y) AS y, COALESCE(d.z, l.z) AS z,
       CASE WHEN l.t IS NOT NULL THEN {ANNOTATE_ID}
            ELSE COALESCE(d.value, 0) END AS value
FROM {_SQL_ANNO_OLD} AS d
FULL OUTER JOIN {_SQL_LOCS} AS l
  ON d.t = l.t AND d.x = l.x AND d.y = l.y AND d.z = l.z
WHERE CASE WHEN l.t IS NOT NULL THEN {ANNOTATE_ID}
           ELSE COALESCE(d.value, 0) END <> 0
"""


def q_spatial_annotate_exceptions(spark: SparkSession, sf_dir: str) -> DataFrame:
    data = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True, where=_OLD_WHERE)
    locs = voxels_df(spark, sf_dir, dedup=True, where=_NEW_WHERE).select("t", "x", "y", "z")
    _, exceptions = V.annotate(data, locs, ANNOTATE_ID, conflict="E")
    return exceptions


SQL_SPATIAL_ANNOTATE_EXCEPTIONS = f"""
SELECT l.t, l.x, l.y, l.z
FROM {_SQL_LOCS} AS l
JOIN {_SQL_ANNO_OLD} AS d
  ON d.t = l.t AND d.x = l.x AND d.y = l.y AND d.z = l.z
WHERE d.value <> 0 AND d.value <> {ANNOTATE_ID}
"""


def q_spatial_relabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True)
    return V.relabel(v, ANNO_ID, 1000000)


SQL_SPATIAL_RELABEL = f"""
SELECT t, x, y, z,
       CASE WHEN value = {ANNO_ID} THEN 1000000 ELSE value END AS value
FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS v
"""


# --- hierarchy ------------------------------------------------------------

def q_spatial_downsample_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, dedup=True)
    return V.downsample_image_stride(v, factor=1)


SQL_SPATIAL_DOWNSAMPLE_STRIDE = f"""
SELECT t, x // 2 AS x, y // 2 AS y, z, value
FROM {voxels_sql(dedup=True)} AS v
WHERE (x % 2) = 0 AND (y % 2) = 0
"""


def q_spatial_downsample_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, dedup=True)
    return V.downsample_image_avg(v, factor=1)


SQL_SPATIAL_DOWNSAMPLE_AVG = f"""
SELECT t, (x // 2) AS x, (y // 2) AS y, z, AVG(value) AS value
FROM {voxels_sql(dedup=True)} AS v
GROUP BY t, (x // 2), (y // 2), z
"""


def q_spatial_downsample_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, dedup=True)
    return V.downsample_image_box(v, factor=1)


SQL_SPATIAL_DOWNSAMPLE_BOX = f"""
SELECT t, (x // 2) AS x, (y // 2) AS y, z,
       CAST(SUM(value) AS BIGINT) / 4.0 AS value
FROM {voxels_sql(dedup=True)} AS v
GROUP BY t, (x // 2), (y // 2), z
"""


def q_spatial_downsample_anno(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dedup=False: the fixture's dedup semantics is MAX per coordinate,
    # and the corner pivot inside downsample_annotation is itself a
    # conditional MAX — duplicates of a voxel land in the same corner
    # slot, so the pivot absorbs the dedup and the pre-aggregation's
    # shuffle is pure overhead (oracle output identical; the SQL side
    # keeps the explicit dedup subquery).
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=False)
    return V.downsample_annotation(v, isotropic=False)


def _pivot_sql(
    zdiv: bool, value_expr: str = VALUE_ANNO, from_sql: str | None = None
) -> str:
    """`from_sql` overrides the source relation (default: the fixture
    voxels) — pyramid levels pivot the PREVIOUS level's output."""
    zgrp = "(z // 2)" if zdiv else "z"
    zsel = "z % 2" if zdiv else ""
    corners = ",\n    ".join(
        f"{_corner_sql(xs, ys, zsel, zs)} AS v{'' if not zdiv else ('t' if zs == 0 else 'b')}{ys}{xs}"
        if zdiv
        else f"{_corner_sql(xs, ys, '', 0)} AS v{ys}{xs}"
        for zs in ([0, 1] if zdiv else [0])
        for ys in (0, 1)
        for xs in (0, 1)
    )
    src = from_sql or voxels_sql(value_expr=value_expr, dedup=True)
    return f"""
  SELECT t, (x // 2) AS x, (y // 2) AS y, {zgrp} AS z,
    {corners}
  FROM {src} AS v
  GROUP BY t, (x // 2), (y // 2), {zgrp}"""


SQL_SPATIAL_DOWNSAMPLE_ANNO = f"""
SELECT t, x, y, z, value FROM ({_ann_value_sql(_pivot_sql(zdiv=False))})
WHERE value <> 0
"""


def q_spatial_pyramid_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resolution-pyramid LEVEL 2: the exact getAnnValue reduction applied
    to its own level-1 output — the stacked-downsample math
    `store.build_pyramid` materializes per level (reference addData.c's
    addDataToStack pipeline). Pins that the reduction COMPOSES: corner
    tie-breaking, the v10-on-zero quirk, and zero-drop all behave on a
    reduced input exactly as the twice-applied oracle predicts."""
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=False)
    return V.downsample_annotation(
        V.downsample_annotation(v, isotropic=False), isotropic=False
    )


_L1_SQL = f"(SELECT t, x, y, z, value FROM ({_ann_value_sql(_pivot_sql(zdiv=False))}) WHERE value <> 0)"

SQL_SPATIAL_PYRAMID_L2 = f"""
SELECT t, x, y, z, value
FROM ({_ann_value_sql(_pivot_sql(zdiv=False, from_sql=_L1_SQL))})
WHERE value <> 0
"""


def q_spatial_downsample_anno_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dedup=False — same MAX-absorption as q_spatial_downsample_anno
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=False)
    return V.downsample_annotation(v, isotropic=True)


SQL_SPATIAL_DOWNSAMPLE_ANNO_ISO = f"""
WITH piv AS ({_pivot_sql(zdiv=True)}),
top AS (
  SELECT t, x, y, z, value AS vtop FROM (
    {_ann_value_sql('SELECT t, x, y, z, vt00 AS v00, vt01 AS v01, vt10 AS v10, vt11 AS v11 FROM piv')}
  )
),
bot AS (
  SELECT t, x, y, z, value AS vbot FROM (
    {_ann_value_sql('SELECT t, x, y, z, vb00 AS v00, vb01 AS v01, vb10 AS v10, vb11 AS v11 FROM piv')}
  )
)
SELECT top.t, top.x, top.y, top.z,
       CASE WHEN vtop <> 0 THEN vtop ELSE vbot END AS value
FROM top JOIN bot ON top.t = bot.t AND top.x = bot.x AND top.y = bot.y AND top.z = bot.z
WHERE CASE WHEN vtop <> 0 THEN vtop ELSE vbot END <> 0
"""


def q_spatial_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, dedup=True)
    return V.upsample_replicate(v, factor=1)


SQL_SPATIAL_UPSAMPLE = f"""
SELECT t, x * 2 + dx.d AS x, y * 2 + dy.d AS y, z, value
FROM {voxels_sql(dedup=True)} AS v
CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS dx(d)
CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) AS dy(d)
"""


def q_spatial_downsample_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride zoom-out by 4x (factor=2) — zoomOutData with factor>1."""
    v = voxels_df(spark, sf_dir, dedup=True)
    return V.downsample_image_stride(v, factor=2)


SQL_SPATIAL_DOWNSAMPLE_F2 = f"""
SELECT t, x // 4 AS x, y // 4 AS y, z, value
FROM {voxels_sql(dedup=True)} AS v
WHERE (x % 4) = 0 AND (y % 4) = 0
"""


def q_spatial_upsample_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication zoom-in by 4x (factor=2) — zoomInData with factor>1.
    Restricted to a small box to bound the 16x row blowup."""
    v = voxels_df(spark, sf_dir, dedup=True)
    return V.upsample_replicate(V.cutout(v, (0, 0, 0), (256, 256, 16)), factor=2)


SQL_SPATIAL_UPSAMPLE_F2 = f"""
SELECT t, x * 4 + dx.d AS x, y * 4 + dy.d AS y, z, value
FROM {voxels_sql(dedup=True)} AS v
CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)) AS dx(d)
CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (1), (2), (3)) AS dy(d)
WHERE v.x >= 0 AND v.x < 256 AND v.y >= 0 AND v.y < 256 AND v.z >= 0 AND v.z < 16
"""


def q_spatial_isotropic_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dedup=False: isotropic_build's z-pair pivot is a conditional MAX per
    # (t,x,y,z//2,z%2) slot, which absorbs the fixture's MAX-dedup — same
    # single-shuffle absorption as the annotation downsample entries.
    v = voxels_df(spark, sf_dir, dedup=False)
    return V.isotropic_build(v)


SQL_SPATIAL_ISOTROPIC_BUILD = f"""
SELECT t, x, y, z,
       CASE WHEN a = 0 THEN b WHEN b = 0 THEN a
            ELSE (a + b) // 2 END AS value
FROM (
  SELECT t, x, y, (z // 2) AS z,
         COALESCE(MAX(CASE WHEN (z % 2) = 0 THEN value END), 0) AS a,
         COALESCE(MAX(CASE WHEN (z % 2) = 1 THEN value END), 0) AS b
  FROM {voxels_sql(dedup=True)} AS v
  GROUP BY t, x, y, (z // 2)
)
WHERE CASE WHEN a = 0 THEN b WHEN b = 0 THEN a
           ELSE (a + b) // 2 END <> 0
"""


def q_spatial_isotropic_build_f32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Legacy float32 isotropicBuild variant (isotropicBuild.c:88-106):
    non-truncating float average, 0 still means missing. Half-integer
    results are exactly representable, so the double values hash-match
    the oracle."""
    v = voxels_df(spark, sf_dir, dedup=False)  # MAX-pivot absorbs dedup
    return V.isotropic_build(v, float_values=True)


SQL_SPATIAL_ISOTROPIC_BUILD_F32 = f"""
SELECT t, x, y, z,
       CASE WHEN a = 0 THEN CAST(b AS DOUBLE) WHEN b = 0 THEN CAST(a AS DOUBLE)
            ELSE (a + b) / 2.0 END AS value
FROM (
  SELECT t, x, y, (z // 2) AS z,
         COALESCE(MAX(CASE WHEN (z % 2) = 0 THEN value END), 0) AS a,
         COALESCE(MAX(CASE WHEN (z % 2) = 1 THEN value END), 0) AS b
  FROM {voxels_sql(dedup=True)} AS v
  GROUP BY t, x, y, (z // 2)
)
WHERE CASE WHEN a = 0 THEN CAST(b AS DOUBLE) WHEN b = 0 THEN CAST(a AS DOUBLE)
           ELSE (a + b) / 2.0 END <> 0
"""


def q_spatial_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3x3 xy mean filter over a bounded box (scatter + one agg)."""
    v = voxels_df(spark, sf_dir, dedup=True)
    return V.smooth_xy(V.cutout(v, (0, 0, 0), (256, 256, 16)), radius=1)


SQL_SPATIAL_SMOOTH = f"""
SELECT t, x + dx.d AS x, y + dy.d AS y, z,
       CAST(SUM(value) AS BIGINT) / 9.0 AS value
FROM {voxels_sql(dedup=True)} AS v
CROSS JOIN (VALUES (CAST(-1 AS BIGINT)), (0), (1)) AS dx(d)
CROSS JOIN (VALUES (CAST(-1 AS BIGINT)), (0), (1)) AS dy(d)
WHERE v.x >= 0 AND v.x < 256 AND v.y >= 0 AND v.y < 256 AND v.z >= 0 AND v.z < 16
GROUP BY t, x + dx.d, y + dy.d, z
"""


def q_spatial_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surface area + volume per annotation object (6-neighborhood)."""
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True)
    return V.surface_stats(v)


SQL_SPATIAL_SURFACE = f"""
WITH contrib AS (
  SELECT t, x + o.dx AS x, y + o.dy AS y, z + o.dz AS z, value,
         0 AS present, 1 AS nbr
  FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS v
  CROSS JOIN (VALUES (CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
                     (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                     (0, 0, 1), (0, 0, -1)) AS o(dx, dy, dz)
  UNION ALL
  SELECT t, x, y, z, value, 1, 0
  FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS v2
),
g AS (
  SELECT t, x, y, z, value, SUM(present) AS p, SUM(nbr) AS n
  FROM contrib GROUP BY t, x, y, z, value
)
SELECT value AS anno_id,
       CAST(SUM(CASE WHEN n < 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_surface,
       COUNT(*) AS n_total
FROM g WHERE p > 0
GROUP BY value
"""


def q_spatial_cross_channel_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image intensities under selected annotation objects (cross-channel
    mask via the channel sources/related linkage)."""
    img = voxels_df(spark, sf_dir, value_expr=VALUE_IMAGE, dedup=True)
    anno = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True)
    return V.mask_by_annotation(img, anno, ids=(3, 7, 11))


SQL_SPATIAL_CROSS_CHANNEL_MASK = f"""
SELECT i.t, i.x, i.y, i.z, i.value, a.value AS anno_id
FROM {voxels_sql(value_expr=VALUE_IMAGE, dedup=True)} AS i
JOIN {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS a
  ON i.t = a.t AND i.x = a.x AND i.y = a.y AND i.z = a.z
WHERE a.value IN (3, 7, 11)
"""


def q_spatial_object_intensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-object intensity statistics: for every annotation id, the count,
    sum and floor-scaled mean of co-located image voxel values — feature
    extraction over a segmentation (one join + one partial/final agg)."""
    img = voxels_df(spark, sf_dir, value_expr=VALUE_IMAGE, dedup=True)
    anno = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True)
    masked = V.mask_by_annotation(img, anno)
    return masked.groupBy("anno_id").agg(
        F.count("*").alias("n_vox"),
        F.sum("value").alias("sum_intensity"),
        (F.floor((F.sum("value") / F.count("*")) * 1000000) / 1000000).alias(
            "mean_intensity"
        ),
    )


SQL_SPATIAL_OBJECT_INTENSITY = f"""
SELECT a.value AS anno_id, COUNT(*) AS n_vox,
       CAST(SUM(i.value) AS BIGINT) AS sum_intensity,
       FLOOR((CAST(SUM(i.value) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)) * 1000000)
         / 1000000 AS mean_intensity
FROM {voxels_sql(value_expr=VALUE_IMAGE, dedup=True)} AS i
JOIN {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS a
  ON i.t = a.t AND i.x = a.x AND i.y = a.y AND i.z = a.z
WHERE a.value <> 0
GROUP BY a.value
"""


def q_spatial_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3D connected-component labeling of the annotation fixture inside a
    bounded box. Labels are canonical (component = z-major packed minimum
    voxel of its component), so the DuckDB oracle below reproduces them
    exactly via recursive-CTE reachability + MIN."""
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True)
    return V.connected_components(V.cutout(v, (0, 0, 0), (128, 128, 32)))


# Reachability closure per (t, same-value 6-neighborhood), then the
# component label is MIN(vid) — identical to the engine's canonical z-major
# packed minimum because vid = (z<<42)|(y<<21)|x orders by (z, y, x).
# Tractable because the boxed fixture keeps components tiny.
SQL_SPATIAL_CONNECTED_COMPONENTS = f"""
WITH RECURSIVE v AS (
  SELECT t, x, y, z, value,
         z * 4398046511104 + y * 2097152 + x AS vid
  FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS q
  WHERE value <> 0
    AND x >= 0 AND x < 128 AND y >= 0 AND y < 128 AND z >= 0 AND z < 32
),
e AS (
  SELECT a.t AS t, a.vid AS src, b.vid AS dst
  FROM v a JOIN v b
    ON a.t = b.t AND a.value = b.value
   AND abs(a.x - b.x) + abs(a.y - b.y) + abs(a.z - b.z) = 1
),
reach(t, vid, r) AS (
  SELECT t, vid, vid FROM v
  UNION
  SELECT e.t, e.src, reach.r
  FROM e JOIN reach ON e.t = reach.t AND e.dst = reach.vid
),
lab AS (
  SELECT t, vid, MIN(r) AS component FROM reach GROUP BY t, vid
)
SELECT v.t, v.x, v.y, v.z, v.value, lab.component
FROM v JOIN lab ON v.t = lab.t AND v.vid = lab.vid
"""


def q_spatial_time_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range cutout with missing samples rendered as zeros
    (spatialdb.py:175-199), bounded to a small box so the coordinate x time
    grid stays proportionate."""
    v = voxels_df(spark, sf_dir, dedup=True)
    small = V.cutout(v, (0, 0, 0), (256, 256, 16))
    return V.time_filled(small, 0, 3)


SQL_SPATIAL_TIME_FILLED = f"""
WITH v AS (
  SELECT * FROM {voxels_sql(dedup=True)} AS q
  WHERE x >= 0 AND x < 256 AND y >= 0 AND y < 256 AND z >= 0 AND z < 16
),
grid AS (
  SELECT x, y, z, CAST(ts.t AS BIGINT) AS t
  FROM (SELECT DISTINCT x, y, z FROM v)
  CROSS JOIN (VALUES (0), (1), (2)) AS ts(t)
)
SELECT g.t, g.x, g.y, g.z, COALESCE(v.value, 0) AS value
FROM grid g
LEFT JOIN v ON v.x = g.x AND v.y = g.y AND v.z = g.z AND v.t = g.t
"""


# --- time series ----------------------------------------------------------

def q_spatial_missing_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = voxels_df(spark, sf_dir, dedup=True)
    return V.missing_time_steps(v, 0, 3)


SQL_SPATIAL_MISSING_TIME = f"""
WITH v AS (SELECT * FROM {voxels_sql(dedup=True)} AS q),
grid AS (
  SELECT x, y, z, CAST(ts.t AS BIGINT) AS t
  FROM (SELECT DISTINCT x, y, z FROM v)
  CROSS JOIN (VALUES (0), (1), (2)) AS ts(t)
)
SELECT g.x, g.y, g.z, g.t FROM grid g
WHERE NOT EXISTS (
  SELECT 1 FROM v WHERE v.x = g.x AND v.y = g.y AND v.z = g.z AND v.t = g.t
)
"""


def q_spatial_recolor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotation recolor via broadcast palette join (recolorCube.c keyed
    value % 181; palette generated from md5, not copied)."""
    from spdb_spark.operators.render import recolor

    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True)
    return recolor(v)


SQL_SPATIAL_RECOLOR = f"""
WITH pal AS (
  SELECT CAST(r.range AS INTEGER) AS pid,
         CAST(('0x' || substr(md5('palette:' || CAST(r.range AS VARCHAR)), 1, 2)) AS INTEGER) AS r,
         CAST(('0x' || substr(md5('palette:' || CAST(r.range AS VARCHAR)), 3, 2)) AS INTEGER) AS g,
         CAST(('0x' || substr(md5('palette:' || CAST(r.range AS VARCHAR)), 5, 2)) AS INTEGER) AS b,
         255 AS a
  FROM range(0, 181) r
)
SELECT v.t, v.x, v.y, v.z, v.value,
       CASE WHEN v.value = 0 THEN 0 ELSE pal.r END AS r,
       CASE WHEN v.value = 0 THEN 0 ELSE pal.g END AS g,
       CASE WHEN v.value = 0 THEN 0 ELSE pal.b END AS b,
       CASE WHEN v.value = 0 THEN 0 ELSE pal.a END AS a
FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS v
LEFT JOIN pal ON pal.pid = CAST(v.value % 181 AS INTEGER)
"""


# --- tile-grid export (tile-service manifest) ------------------------------

TILE_Z, TILE_T, TILE_SIZE = 8, 0, 256


def q_spatial_tile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile manifest of one XY plane: per-tile voxel count, value sum, and
    a content hash over row-major-ordered cells (render.tile_grid) — the
    index the reference's tile endpoint would serve from."""
    from spdb_spark.operators.render import tile_grid

    v = voxels_df(spark, sf_dir, dedup=True)
    return tile_grid(v, TILE_Z, TILE_T, tile_size=TILE_SIZE)


_TILE_OFF = f"(y % {TILE_SIZE}) * {TILE_SIZE} + (x % {TILE_SIZE})"

SQL_SPATIAL_TILE_GRID = f"""
SELECT CAST(y // {TILE_SIZE} AS BIGINT) AS tile_y,
       CAST(x // {TILE_SIZE} AS BIGINT) AS tile_x,
       COUNT(*) AS n_voxels,
       CAST(SUM(value) AS BIGINT) AS sum_value,
       md5(string_agg(
         CAST({_TILE_OFF} AS VARCHAR) || ':' || CAST(value AS VARCHAR),
         ',' ORDER BY {_TILE_OFF}
       )) AS content_hash
FROM {voxels_sql(dedup=True)} v
WHERE z = {TILE_Z} AND t = {TILE_T}
GROUP BY 1, 2
"""



def q_spatial_object_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid + integer moment trace per annotation object."""
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True)
    return V.object_moments(v)


SQL_SPATIAL_OBJECT_MOMENTS = f"""
SELECT value AS anno_id, COUNT(*) AS n_voxels,
       FLOOR(SUM(x) * 1000000 / COUNT(*)) / 1000000 AS cx,
       FLOOR(SUM(y) * 1000000 / COUNT(*)) / 1000000 AS cy,
       FLOOR(SUM(z) * 1000000 / COUNT(*)) / 1000000 AS cz,
       CAST(SUM(x*x + y*y + z*z) AS BIGINT) AS moment_trace
FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS v
WHERE value <> 0
GROUP BY value
"""


_MORPH_OFFS_SQL = """CROSS JOIN (VALUES (CAST(1 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
                     (-1, 0, 0), (0, 1, 0), (0, -1, 0),
                     (0, 0, 1), (0, 0, -1)) AS o(dx, dy, dz)"""


def q_spatial_dilate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary 6-neighborhood dilation (min-id claim on empty positions)."""
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True)
    return V.dilate(v, bounds=FIXTURE_BOUNDS)


SQL_SPATIAL_DILATE = f"""
WITH contrib AS (
  SELECT t, x + o.dx AS x, y + o.dy AS y, z + o.dz AS z, value,
         0 AS present, 1 AS nbr
  FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS v
  {_MORPH_OFFS_SQL}
  UNION ALL
  SELECT t, x, y, z, value, 1, 0
  FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS v2
),
g AS (
  SELECT t, x, y, z,
         MAX(CASE WHEN present = 1 THEN value END) AS self_val,
         MIN(CASE WHEN nbr = 1 THEN value END) AS nbr_min
  FROM contrib GROUP BY t, x, y, z
)
SELECT t, x, y, z, COALESCE(self_val, nbr_min) AS value FROM g
"""


def q_spatial_closing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morphological closing: erode(dilate(v)) — fills pits/gaps smaller
    than the structuring element. Gated as the composition because the
    sparse fixture has no interior voxels for a bare erosion to keep
    (plain erode's semantics are pinned by crafted-shape unit tests)."""
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True)
    return V.closing(v, bounds=FIXTURE_BOUNDS)


SQL_SPATIAL_CLOSING = f"""
WITH dcontrib AS (
  SELECT t, x + o.dx AS x, y + o.dy AS y, z + o.dz AS z, value,
         0 AS present, 1 AS nbr
  FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS v
  {_MORPH_OFFS_SQL}
  UNION ALL
  SELECT t, x, y, z, value, 1, 0
  FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS v2
),
dil AS (
  SELECT t, x, y, z,
         COALESCE(MAX(CASE WHEN present = 1 THEN value END),
                  MIN(CASE WHEN nbr = 1 THEN value END)) AS value
  FROM dcontrib GROUP BY t, x, y, z
),
econtrib AS (
  SELECT t, x + o.dx AS x, y + o.dy AS y, z + o.dz AS z, value,
         0 AS present, 1 AS nbr
  FROM dil
  {_MORPH_OFFS_SQL}
  UNION ALL
  SELECT t, x, y, z, value, 1, 0 FROM dil
),
g AS (
  SELECT t, x, y, z, value, SUM(present) AS p, SUM(nbr) AS n
  FROM econtrib GROUP BY t, x, y, z, value
)
SELECT t, x, y, z, value FROM g WHERE p > 0 AND n = 6
"""


def q_spatial_object_contacts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Face-contact counts between different annotation objects."""
    v = voxels_df(spark, sf_dir, value_expr=VALUE_ANNO, dedup=True)
    return V.object_contacts(v, bounds=FIXTURE_BOUNDS)


SQL_SPATIAL_OBJECT_CONTACTS = f"""
WITH nz AS (
  SELECT t, x, y, z, value
  FROM {voxels_sql(value_expr=VALUE_ANNO, dedup=True)} AS v WHERE value <> 0
),
scattered AS (
  SELECT t, x + o.dx AS x, y + o.dy AS y, z + o.dz AS z, value AS src_id
  FROM nz
  {_MORPH_OFFS_SQL}
)
SELECT LEAST(s.src_id, n.value) AS id_a,
       GREATEST(s.src_id, n.value) AS id_b,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_contacts
FROM scattered s
JOIN nz n ON s.t = n.t AND s.x = n.x AND s.y = n.y AND s.z = n.z
WHERE n.value <> s.src_id
GROUP BY 1, 2
"""


def q_spatial_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channel intensity histogram (auto-contrast statistic)."""
    v = voxels_df(spark, sf_dir, value_expr=VALUE_IMAGE, dedup=True)
    return V.value_histogram(v)


SQL_SPATIAL_HISTOGRAM = f"""
SELECT bucket, bucket * 4 AS lo, COUNT(*) AS n_voxels
FROM (
  SELECT LEAST(value // 4, 63) AS bucket
  FROM {voxels_sql(value_expr=VALUE_IMAGE, dedup=True)} AS v
)
GROUP BY bucket
"""

QUERIES = {
    "spatial_cutout": (q_spatial_cutout, SQL_SPATIAL_CUTOUT),
    "spatial_tile_grid": (q_spatial_tile_grid, SQL_SPATIAL_TILE_GRID),
    "spatial_recolor": (q_spatial_recolor, SQL_SPATIAL_RECOLOR),
    "spatial_cutout_filtered": (q_spatial_cutout_filtered, SQL_SPATIAL_CUTOUT_FILTERED),
    "spatial_cuboid_agg": (q_spatial_cuboid_agg, SQL_SPATIAL_CUBOID_AGG),
    "spatial_ids_in_region": (q_spatial_ids_in_region, SQL_SPATIAL_IDS_IN_REGION),
    "spatial_tight_bbox": (q_spatial_tight_bbox, SQL_SPATIAL_TIGHT_BBOX),
    "spatial_loose_bbox": (q_spatial_loose_bbox, SQL_SPATIAL_LOOSE_BBOX),
    "spatial_cuboid_id_index": (q_spatial_cuboid_id_index, SQL_SPATIAL_CUBOID_ID_INDEX),
    "spatial_cuboids_with_id": (q_spatial_cuboids_with_id, SQL_SPATIAL_CUBOIDS_WITH_ID),
    # The benched `spatial_overwrite` name measures the SCALE form (tag-union
    # + one partial-agg shuffle — ~20% faster at sf0.1 and three shuffles
    # fewer); the classic full-outer-join form keeps its own gate under
    # `spatial_overwrite_join`. Both are checked against the same oracle.
    "spatial_overwrite": (q_spatial_overwrite_union, SQL_SPATIAL_OVERWRITE),
    "spatial_overwrite_join": (q_spatial_overwrite, SQL_SPATIAL_OVERWRITE),
    "spatial_exception_merge": (q_spatial_exception_merge, SQL_SPATIAL_EXCEPTION_MERGE),
    "spatial_exception_union": (q_spatial_exception_union, SQL_SPATIAL_EXCEPTION_MERGE),
    "spatial_shave": (q_spatial_shave, SQL_SPATIAL_SHAVE),
    "spatial_annotate_overwrite": (q_spatial_annotate_overwrite, SQL_SPATIAL_ANNOTATE_OVERWRITE),
    "spatial_annotate_exceptions": (q_spatial_annotate_exceptions, SQL_SPATIAL_ANNOTATE_EXCEPTIONS),
    "spatial_relabel": (q_spatial_relabel, SQL_SPATIAL_RELABEL),
    "spatial_downsample_stride": (q_spatial_downsample_stride, SQL_SPATIAL_DOWNSAMPLE_STRIDE),
    "spatial_downsample_avg": (q_spatial_downsample_avg, SQL_SPATIAL_DOWNSAMPLE_AVG),
    "spatial_downsample_box": (q_spatial_downsample_box, SQL_SPATIAL_DOWNSAMPLE_BOX),
    "spatial_downsample_anno": (q_spatial_downsample_anno, SQL_SPATIAL_DOWNSAMPLE_ANNO),
    "spatial_downsample_anno_iso": (q_spatial_downsample_anno_iso, SQL_SPATIAL_DOWNSAMPLE_ANNO_ISO),
    "spatial_upsample": (q_spatial_upsample, SQL_SPATIAL_UPSAMPLE),
    "spatial_downsample_f2": (q_spatial_downsample_f2, SQL_SPATIAL_DOWNSAMPLE_F2),
    "spatial_upsample_f2": (q_spatial_upsample_f2, SQL_SPATIAL_UPSAMPLE_F2),
    "spatial_isotropic_build": (q_spatial_isotropic_build, SQL_SPATIAL_ISOTROPIC_BUILD),
    "spatial_isotropic_build_f32": (
        q_spatial_isotropic_build_f32,
        SQL_SPATIAL_ISOTROPIC_BUILD_F32,
    ),
    "spatial_missing_time": (q_spatial_missing_time, SQL_SPATIAL_MISSING_TIME),
    "spatial_time_filled": (q_spatial_time_filled, SQL_SPATIAL_TIME_FILLED),
    "spatial_surface": (q_spatial_surface, SQL_SPATIAL_SURFACE),
    "spatial_object_moments": (q_spatial_object_moments, SQL_SPATIAL_OBJECT_MOMENTS),
    "spatial_dilate": (q_spatial_dilate, SQL_SPATIAL_DILATE),
    "spatial_closing": (q_spatial_closing, SQL_SPATIAL_CLOSING),
    "spatial_object_contacts": (q_spatial_object_contacts, SQL_SPATIAL_OBJECT_CONTACTS),
    "spatial_histogram": (q_spatial_histogram, SQL_SPATIAL_HISTOGRAM),
    "spatial_cross_channel_mask": (q_spatial_cross_channel_mask, SQL_SPATIAL_CROSS_CHANNEL_MASK),
    "spatial_object_intensity": (q_spatial_object_intensity, SQL_SPATIAL_OBJECT_INTENSITY),
    "spatial_smooth": (q_spatial_smooth, SQL_SPATIAL_SMOOTH),
    "spatial_connected_components": (
        q_spatial_connected_components,
        SQL_SPATIAL_CONNECTED_COMPONENTS,
    ),
    # --- round-6 additions (append-only: rotation window headroom) ---------
    "spatial_to_black": (q_spatial_to_black, SQL_SPATIAL_TO_BLACK),
    "spatial_pyramid_l2": (q_spatial_pyramid_l2, SQL_SPATIAL_PYRAMID_L2),
}
