"""Relational operators Spark lacks as single calls, built Spark-first.

The reference engine has no general joins (SURVEY.md §2.3) — these are the
north-star additions (BASELINE.json) implemented as scalable DataFrame
compositions: as-of join via the union+last_value trick (no range explosion,
one shuffle) and range join via broadcast interval table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    right_cols: Sequence[str],
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts within the `on` group (backward as-of join).

    Scalable pattern: tag + union both sides, one window sorted by
    (ts, side) per group carrying last non-null right values forward, then
    keep left rows. One shuffle on `on`, no range cross-product — survives
    skewed 100TB inputs where an inequality join would explode.

    Right side should be pre-deduplicated to one row per (on, ts); at equal
    timestamps the right row sorts first (inclusive <=).
    """
    on = list(on)
    lcols = [c for c in left.columns if c not in on and c != ts]
    tagged_left = left.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    tagged_right = right.select(
        *on,
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_cols
        ],
    )
    return (
        carried.where(F.col("_side") == 1)
        .drop("_side", *[f"_r_{c}" for c in right_cols])
        .withColumnRenamed("_ts", ts)
    )


def range_join_buckets(
    df: DataFrame,
    ts_ms: str,
    start_ms: int,
    bucket_ms: int,
    n_buckets: int,
) -> DataFrame:
    """Attach a bucket id by range-joining against a generated interval table
    (broadcast — the small side never shuffles the big side)."""
    spark = df.sparkSession
    buckets = spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (F.lit(start_ms) + F.col("id") * bucket_ms).alias("b_start"),
        (F.lit(start_ms) + (F.col("id") + 1) * bucket_ms).alias("b_end"),
    )
    return df.join(
        F.broadcast(buckets),
        (F.col(ts_ms) >= F.col("b_start")) & (F.col(ts_ms) < F.col("b_end")),
        "inner",
    )
