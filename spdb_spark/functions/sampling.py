"""Deterministic dataset curation: reproducible train/val/test splits and
stratified sampling via the engine-portable md5 hash.

A training-data pipeline cannot use `rand()`/`df.sample` for splits: the
assignment must be a pure function of the row key so it is stable across
runs, engines, re-partitioning, and incremental re-processing (a doc
keeps its split when the corpus grows). Bucket = md5_long(salt || id) %
granularity; split boundaries are cumulative weight thresholds.

Everything is a JVM-side expression (md5/conv built-ins): no UDF, no
shuffle — splits and samples are narrow map-side ops that compose with
any downstream filter pushdown.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.hashing import md5_long

GRANULARITY = 10_000


def hash_bucket(id_col: Column, salt: str = "", granularity: int = GRANULARITY) -> Column:
    """Deterministic bucket in [0, granularity) from a row key."""
    return md5_long(F.concat(F.lit(salt), id_col.cast("string"))) % granularity


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, float] | None = None,
    salt: str = "split",
    granularity: int = GRANULARITY,
) -> DataFrame:
    """Add a `split` column ('train'/'val'/... ) assigned by hash bucket.

    Weights are insertion-ordered; boundaries are floor(cum_weight *
    granularity), so every bucket maps to exactly one split and the
    realized fractions are within 1/granularity of the request.
    """
    weights = dict(weights or {"train": 0.8, "val": 0.1, "test": 0.1})
    b = hash_bucket(F.col(id_col), salt, granularity)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        bound = int(cum * granularity)
        cond = b < F.lit(bound)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
    granularity: int = GRANULARITY,
) -> DataFrame:
    """Deterministic per-stratum sample: keep a row iff its hash bucket is
    below floor(fraction[stratum] * granularity). Unlisted strata use
    `default_fraction`. Pure filter — no shuffle, reproducible, and
    consistent under corpus growth (existing rows never flip)."""
    b = hash_bucket(F.col(id_col), salt, granularity)
    expr = None
    for stratum, frac in fractions.items():
        cond = F.col(strata_col) == stratum
        bound = F.lit(int(frac * granularity))
        expr = F.when(cond, bound) if expr is None else expr.when(cond, bound)
    bound_col = (
        F.lit(int(default_fraction * granularity))
        if expr is None
        else expr.otherwise(int(default_fraction * granularity))
    )
    return df.where(b < bound_col)
