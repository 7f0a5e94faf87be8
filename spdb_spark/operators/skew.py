"""Skew mitigation: salted joins and sketch-based aggregation.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; explicit salting remains the tool when one side must pre-aggregate
by a hot key (AQE can't split a hash-aggregate's hot group). The HLL
approximate-distinct path replaces exact id enumeration when only
cardinality is needed (the reference's get_ids_in_region returns full id
sets; at 100TB the count is often the real question).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys: the (large, skewed) left side gets a
    random salt in [0, n_salts); the (smaller) right side is replicated
    n_salts times. Each hot key spreads over n_salts tasks."""
    on = list(on)
    l_salted = left.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    r_replicated = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return l_salted.join(r_replicated, on=[*on, "_salt"], how=how).drop("_salt")


def salted_count(
    df: DataFrame, key_cols: Sequence[str], n_salts: int = 16
) -> DataFrame:
    """Two-phase count for hot groups: partial count per (key, salt), then
    final sum per key — the hot group's partial work spreads over n_salts
    tasks before the (tiny) final aggregation."""
    key_cols = list(key_cols)
    partial = (
        df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("n"))


def approx_distinct_ids(
    v: DataFrame, group: Sequence[str] | None = None, rsd: float = 0.02
) -> DataFrame:
    """HyperLogLog++ approximate distinct id count (optionally per group) —
    the sketch path for ids-in-region-style questions at 100TB: one pass,
    bounded memory, mergeable partial state."""
    agg = F.approx_count_distinct("value", rsd=rsd).alias("approx_n_ids")
    if group:
        return v.where(F.col("value") != 0).groupBy(*list(group)).agg(agg)
    return v.where(F.col("value") != 0).agg(agg)
