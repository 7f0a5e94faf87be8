"""Count-min sketch — fixed-memory frequency estimation (Cormode &
Muthukrishnan 2005), completing the sketch family next to HLL distinct
counting (`llm_approx_vocab`) and Bloom membership (membership.py):
heavy-hitter token counts, hot-key detection for salting decisions, and
per-key rate estimates on streams, all in depth x width integers no
matter how many distinct keys flow through.

Protocol (engine-portable, the same md5-derived integers as the rest of
the repo — functions/hashing.py):

    bucket_r(key) = md5_long(str(r) || ':' || key) % width,  r in 0..d-1
    sketch[r][b]  = sum of weights of keys hashing to (r, b)
    estimate(key) = min_r sketch[r][bucket_r(key)]

Estimates are BIASED UP, never down (min over d independent rows of a
non-negative-sum table): estimate >= true count always, with
overestimate probability shrinking exponentially in depth. All
arithmetic is integer (counts) or exact long sums (weights), so the
DuckDB twin matches bit-for-bit with no float protocol at all.

Scale shape: the build is ONE explode to depth rows per occurrence and
ONE map-side-combined groupBy down to <= depth*width rows — the shuffle
carries the sketch, not the corpus. Estimation joins the (tiny) sketch
broadcast. Sketches over disjoint slices merge by elementwise sum
(`countmin_merge`) — the monoid property that makes per-shard builds
and streaming accumulation trivial, exactly as membership.bloom_merge.

Reference-capability analogue: none — north-star surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.hashing import md5_long, md5_long_sql


def _validate(width: int, depth: int) -> None:
    if width < 2:
        raise ValueError(f"width must be >= 2, got {width}")
    if not 1 <= depth <= 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")


def _bucket(c: Column, r: int, width: int) -> Column:
    return md5_long(F.concat(F.lit(f"{r}:"), c)) % width


def countmin_build(
    df: DataFrame,
    col: str,
    width: int,
    depth: int = 3,
    weight_col: str | None = None,
) -> DataFrame:
    """Keys (one row per occurrence, or pre-aggregated with weight_col)
    -> sketch (row int, bucket long, cnt long), <= depth*width rows."""
    _validate(width, depth)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_cell"),
        w.alias("_w"),
    )
    return (
        cells.select("_cell.row", "_cell.bucket", "_w")
        .groupBy("row", "bucket")
        .agg(F.sum("_w").alias("cnt"))
    )


def countmin_merge(*sketches: DataFrame) -> DataFrame:
    """Elementwise sum of sketches built with identical (width, depth):
    per-shard / per-batch sketches fold into one."""
    if not sketches:
        raise ValueError("countmin_merge: no sketches given")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def countmin_estimate(
    df: DataFrame,
    col: str,
    sketch: DataFrame,
    width: int,
    depth: int = 3,
    result_col: str = "est",
    broadcast_sketch: bool = True,
) -> DataFrame:
    """df + estimated-count column (min over the depth rows; >= the true
    count always). One explode to depth rows per key, one equi-join on
    the broadcast sketch, one min-aggregate back to df's grain — which
    means df's rows must be DISTINCT (duplicate rows collapse in the
    group-back; estimate distinct keys, not raw occurrences). Keys the
    sketch never saw estimate 0 (their cells may be unpopulated: a
    missing cell IS a zero counter)."""
    _validate(width, depth)
    cols = df.columns
    probes = df.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _bucket(F.col(col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("_cell"),
    ).select(*cols, "_cell.row", "_cell.bucket")
    s = F.broadcast(sketch) if broadcast_sketch else sketch
    return (
        probes.join(s, ["row", "bucket"], "left")
        .withColumn("_c", F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
        .groupBy(*cols)
        .agg(F.min("_c").alias(result_col))
    )


def countmin_bucket_sql(expr: str, r: int, width: int) -> str:
    """DuckDB fragment computing the identical bucket for row r."""
    hashed = md5_long_sql(f"'{r}:' || {expr}")
    return f"({hashed} % {width})"
