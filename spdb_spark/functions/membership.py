"""Distributed Bloom-filter membership — the crawl-scale "have I seen
this key before?" primitive (URL-seen tests, incremental-crawl revisit
suppression, cheap pre-join pruning before an exact dedup pass).

Protocol (engine-portable, deterministic — the same md5-derived 60-bit
integers every dedup/LSH operator here uses, functions/hashing.py):

    h1 = int(md5(key)[0:15], 16) % m          # lower md5 half
    g  = (int(md5(key)[16:31], 16) % m) | 1   # upper half, forced odd
    pos_i = (h1 + i * g) % m    for i in 0..k-1   (double hashing)

The bitmap is a DataFrame of (word_idx, bits) with **60 bits per
word** — not 64 — because the DuckDB twin must replay the exact bitmap
and DuckDB raises on `1::BIGINT << 63` (the same pre-mask-before-shift
constraint morton._spread_sql documents). m_bits must be a multiple
of 60.

Scale shape: the build is ONE explode + ONE groupBy down to m/60 rows
(bit_or partial-aggregates map-side, so the shuffle carries at most
m/60 rows per task, not the corpus). The probe explodes each key to k
(word, mask) rows and equi-joins the bitmap — broadcast when the
filter is small (the default: even m = 2^32 bits is ~540 MB... pass
broadcast_filter=False past executor-memory scale and it becomes an
ordinary shuffle join on word_idx). Nothing ever collects to the
driver. Filters built on disjoint corpus slices merge by bit_or
(`bloom_merge`) — the union-of-filters property that makes per-shard
builds and streaming accumulation trivial.

False positives are inherent to the structure (never false negatives);
`bloom_probe` answers "maybe member". The driver gate intentionally
sizes the fixture filter small enough to PRODUCE false positives and
the oracle replays the full protocol, proving the engine computes the
real Bloom semantics, not exact membership.

Reference-capability analogue: none — spdb has no membership-sketch
tier; north-star surface for the crawl pipeline (sources/crawl.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 60


def _validate(m_bits: int, k: int) -> None:
    if m_bits <= 0 or m_bits % BITS_PER_WORD != 0:
        raise ValueError(
            f"m_bits must be a positive multiple of {BITS_PER_WORD}, "
            f"got {m_bits}"
        )
    if not 1 <= k <= 64:
        raise ValueError(f"k must be in [1, 64], got {k}")


def bloom_positions(c: Column, m_bits: int, k: int) -> Column:
    """array<long> of the k bit positions for one string key (pure
    Column expression — JVM-side, zero-exchange)."""
    _validate(m_bits, k)
    h = F.md5(c)
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m_bits
    g = (
        F.conv(F.substring(h, 17, 15), 16, 10).cast("long") % m_bits
    ).bitwiseOR(F.lit(1).cast("long"))
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: (h1 + i.cast("long") * g) % m_bits,
    )


def _word_mask(pos_name: str) -> tuple[Column, Column]:
    # shiftleft with a column-valued shift needs the SQL form (the
    # pyspark wrapper only takes a literal); shift <= 59 by construction.
    word = (F.col(pos_name) / BITS_PER_WORD).cast("long")
    mask = F.expr(
        f"shiftleft(cast(1 as bigint), cast({pos_name} % {BITS_PER_WORD} as int))"
    )
    return word, mask


def bloom_build(
    df: DataFrame, col: str, m_bits: int, k: int = 5
) -> DataFrame:
    """Keys -> Bloom bitmap (word_idx long, bits long), <= m_bits/60
    rows. One shuffle, map-side combined."""
    _validate(m_bits, k)
    pos = df.select(
        F.explode(bloom_positions(F.col(col), m_bits, k)).alias("_pos")
    )
    word, mask = _word_mask("_pos")
    return (
        pos.select(word.alias("word_idx"), mask.alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Union of Bloom filters built with identical (m_bits, k): bit_or
    the word tables — per-shard / per-batch builds fold into one."""
    if not filters:
        raise ValueError("bloom_merge: no filters given")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    df: DataFrame,
    col: str,
    bloom: DataFrame,
    m_bits: int,
    k: int = 5,
    id_col: str = "doc_id",
    result_col: str = "maybe_member",
    broadcast_filter: bool = True,
) -> DataFrame:
    """df + one boolean column: true iff all k bits are set ("maybe in
    the set" — false positives possible, false negatives impossible).
    Probe side explodes to k rows per key; the bitmap joins broadcast
    (default) or shuffled on word_idx (broadcast_filter=False for
    filters past executor memory). id_col must uniquely identify df's
    rows — the k probe rows group back on it and re-join df. A NULL
    key yields no probe positions (md5(NULL) is NULL) and comes back
    maybe_member=false — NULL is never a member, matching
    countmin_estimate's keep-with-est-0 treatment of NULL keys."""
    _validate(m_bits, k)
    pos = df.select(
        id_col,
        F.explode(bloom_positions(F.col(col), m_bits, k)).alias("_pos"),
    )
    word, mask = _word_mask("_pos")
    probes = pos.select(id_col, word.alias("word_idx"), mask.alias("mask"))
    b = F.broadcast(bloom) if broadcast_filter else bloom
    hit = F.col("bits").isNotNull() & (
        F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")
    )
    agg = (
        probes.join(b, "word_idx", "left")
        .select(id_col, hit.alias("_hit"))
        .groupBy(id_col)
        .agg(F.bool_and("_hit").alias(result_col))
    )
    # LEFT join + coalesce: a NULL key produced zero probe rows, so it
    # has no agg row — an inner join would silently drop it from the
    # output instead of reporting non-membership.
    return df.join(agg, id_col, "left").withColumn(
        result_col, F.coalesce(F.col(result_col), F.lit(False))
    )


def bloom_positions_sql(expr: str, m_bits: int, k: int) -> str:
    """DuckDB fragment: a LIST of the identical k positions (for oracle
    replays; pairs with bloom_positions)."""
    _validate(m_bits, k)
    h1 = f"(CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT) % {m_bits})"
    g = (
        f"((CAST(('0x' || substr(md5({expr}), 17, 15)) AS BIGINT) "
        f"% {m_bits}) | 1)"
    )
    return (
        f"list_transform(range(0, {k}), "
        f"i -> ({h1} + CAST(i AS BIGINT) * {g}) % {m_bits})"
    )
