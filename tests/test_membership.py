"""Bloom-filter membership: protocol pinned against an independent
Python replica (no false negatives, exact false-positive set), merge
law, validation, and plan shape."""

import hashlib

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.membership import (
    BITS_PER_WORD,
    bloom_build,
    bloom_merge,
    bloom_positions,
    bloom_positions_sql,
    bloom_probe,
)

M, K = 600, 3


def _ref_positions(s: str, m: int = M, k: int = K) -> list[int]:
    h = hashlib.md5(s.encode("utf-8")).hexdigest()
    h1 = int(h[0:15], 16) % m
    g = (int(h[16:31], 16) % m) | 1
    return [(h1 + i * g) % m for i in range(k)]


def _ref_probe(members: list[str], key: str) -> bool:
    bits = set()
    for s in members:
        bits.update(_ref_positions(s))
    return all(p in bits for p in _ref_positions(key))


@pytest.fixture(scope="module")
def keys(spark):
    member = [f"url://site-{i}/page" for i in range(120)]
    other = [f"url://other-{i}/page" for i in range(180)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(member + other)], "doc_id long, key string"
    )
    return df, member, other


def test_positions_match_reference(spark, keys):
    df, member, other = keys
    got = df.select("key", bloom_positions(F.col("key"), M, K).alias("pos"))
    for r in got.collect():
        assert list(r.pos) == _ref_positions(r.key), r.key


def test_probe_exact_vs_reference(spark, keys):
    """Bit-exact protocol equality: members all true (no false
    negatives), non-members match the replica's false-positive set —
    and the fixture is sized so that set is NON-EMPTY (the filter is
    doing Bloom semantics, not exact membership)."""
    df, member, other = keys
    bloom = bloom_build(df.where(F.col("doc_id") < 120), "key", M, K)
    res = bloom_probe(df, "key", bloom, M, K).collect()
    expect = {r: _ref_probe(member, r) for r in member + other}
    fps = 0
    for r in res:
        assert r.maybe_member == expect[r.key], r.key
        if r.key in other and r.maybe_member:
            fps += 1
    assert all(expect[s] for s in member)  # no false negatives, by law
    assert fps > 0  # discriminative fixture: real FPs exercised


def test_probe_keeps_null_keys_as_nonmembers(spark, keys):
    """A NULL key has no md5 positions, so it produces zero probe rows;
    the probe must still RETURN the row (maybe_member=false, matching
    countmin_estimate's est=0 treatment of NULLs) rather than dropping
    it from the output."""
    df, _, _ = keys
    bloom = bloom_build(df.where(F.col("doc_id") < 120), "key", M, K)
    with_null = df.unionByName(
        df.sparkSession.createDataFrame(
            [(999, None)], "doc_id long, key string"
        )
    )
    res = {r.doc_id: r.maybe_member for r in
           bloom_probe(with_null, "key", bloom, M, K).collect()}
    assert len(res) == with_null.count()
    assert res[999] is False


def test_merge_equals_union_build(spark, keys):
    df, _, _ = keys
    a = bloom_build(df.where(F.col("doc_id") % 2 == 0), "key", M, K)
    b = bloom_build(df.where(F.col("doc_id") % 2 == 1), "key", M, K)
    merged = {r.word_idx: r.bits for r in bloom_merge(a, b).collect()}
    full = {r.word_idx: r.bits for r in bloom_build(df, "key", M, K).collect()}
    assert merged == full


def test_bitmap_bounded_and_word_width(spark, keys):
    df, _, _ = keys
    rows = bloom_build(df, "key", M, K).collect()
    assert len(rows) <= M // BITS_PER_WORD
    for r in rows:
        assert 0 <= r.word_idx < M // BITS_PER_WORD
        assert r.bits >> BITS_PER_WORD == 0  # bits 60..63 never set


def test_validation():
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), 601, 3)  # not a multiple of 60
    with pytest.raises(ValueError):
        bloom_positions(F.lit("x"), 600, 0)
    with pytest.raises(ValueError):
        bloom_positions_sql("x", -60, 3)


def test_probe_plan_broadcasts_filter(spark, keys):
    df, _, _ = keys
    bloom = bloom_build(df, "key", M, K)
    plan = bloom_probe(df, "key", bloom, M, K)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # pure Column exprs, no row UDFs


def test_duckdb_fragment_matches(spark, keys):
    import duckdb

    df, member, other = keys
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("keys", pdf)
    frag = bloom_positions_sql("key", M, K)
    got = con.execute(
        f"SELECT key, {frag} AS pos FROM keys ORDER BY doc_id"
    ).fetchall()
    for key, pos in got:
        assert list(pos) == _ref_positions(key), key
