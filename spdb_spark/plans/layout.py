"""Physical layout management — the engine's answer to the reference's
hand-tuned storage tactics (SURVEY.md §4).

- Z-order layout: range-partition by Morton code + in-partition sort, so
  box cutouts touch few files and parquet min/max stats prune row groups
  (the Delta ZORDER/liquid-clustering analog on plain parquet).
- Bucketed tables: co-partition fact tables on their join key at write
  time; joins between same-bucketed tables run with NO shuffle on either
  side — at 100TB this converts every repeated big-big join from a full
  network shuffle into a local zip.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_write(
    v: DataFrame,
    path: str,
    num_files: int | None = None,
) -> None:
    """Write a voxel DataFrame laid out along the Morton curve: range
    partition by morton (balanced files, spatial locality) and sort within
    partitions (row-group stats become tight boxes)."""
    from spdb_spark.operators.voxel import with_cuboid_coords

    m = with_cuboid_coords(v)
    parts = num_files or v.sparkSession.sparkContext.defaultParallelism
    (
        m.repartitionByRange(parts, "morton")
        .sortWithinPartitions("morton", "t", "z", "y", "x")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table; subsequent joins
    and aggregations keyed on `bucket_cols` skip the shuffle entirely."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join_plan_has_no_shuffle(joined: DataFrame) -> bool:
    """True if the physical plan contains no shuffle exchange (used by the
    plan-quality tests; AQE may leave `Exchange` text in subqueries, so we
    check the executed join subtree)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
