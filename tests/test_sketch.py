"""Count-min sketch: protocol pinned against an independent Python
replica, the overestimate law (est >= true, never under), merge law,
weighted build, validation, and plan shape."""

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.sketch import (
    countmin_bucket_sql,
    countmin_build,
    countmin_estimate,
    countmin_merge,
)

W, D = 64, 3


def _ref_bucket(key: str, r: int, w: int = W) -> int:
    h = hashlib.md5(f"{r}:{key}".encode("utf-8")).hexdigest()
    return int(h[0:15], 16) % w


def _ref_sketch(keys: list[str], w: int = W, d: int = D):
    cells = Counter()
    for key in keys:
        for r in range(d):
            cells[(r, _ref_bucket(key, r, w))] += 1
    return cells


def _ref_estimate(cells, key: str, w: int = W, d: int = D) -> int:
    return min(cells.get((r, _ref_bucket(key, r, w)), 0) for r in range(d))


@pytest.fixture(scope="module")
def stream(spark):
    # Zipf-ish: key i appears ~60/(i+1) times; 40 keys over 64 buckets
    # guarantees collisions, so overestimates actually occur.
    keys = [f"tok{i}" for i in range(40) for _ in range(60 // (i + 1))]
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "occ_id long, key string"
    )
    return df, keys


def test_sketch_matches_reference(spark, stream):
    df, keys = stream
    got = {
        (r.row, r.bucket): r.cnt
        for r in countmin_build(df, "key", W, D).collect()
    }
    assert got == dict(_ref_sketch(keys))


def test_estimate_exact_vs_reference_and_overestimate_law(spark, stream):
    df, keys = stream
    sketch = countmin_build(df, "key", W, D)
    probes = spark.createDataFrame(
        [(k,) for k in {f"tok{i}" for i in range(50)}], "key string"
    )  # tok40..tok49 never ingested
    got = {
        r.key: r.est
        for r in countmin_estimate(probes, "key", sketch, W, D).collect()
    }
    cells = _ref_sketch(keys)
    true = Counter(keys)
    over = 0
    for k, est in got.items():
        assert est == _ref_estimate(cells, k), k
        assert est >= true[k], k  # never underestimates
        if est > true[k]:
            over += 1
    assert over > 0  # collisions exercised, not an exact-count accident


def test_merge_equals_union_build(spark, stream):
    df, _ = stream
    a = countmin_build(df.where(F.col("occ_id") % 2 == 0), "key", W, D)
    b = countmin_build(df.where(F.col("occ_id") % 2 == 1), "key", W, D)
    merged = {
        (r.row, r.bucket): r.cnt for r in countmin_merge(a, b).collect()
    }
    full = {
        (r.row, r.bucket): r.cnt
        for r in countmin_build(df, "key", W, D).collect()
    }
    assert merged == full


def test_weighted_build(spark, stream):
    df, keys = stream
    pre = df.groupBy("key").agg(F.count("*").alias("n"))
    weighted = {
        (r.row, r.bucket): r.cnt
        for r in countmin_build(pre, "key", W, D, weight_col="n").collect()
    }
    plain = {
        (r.row, r.bucket): r.cnt
        for r in countmin_build(df, "key", W, D).collect()
    }
    assert weighted == plain


def test_validation():
    from spdb_spark.functions.sketch import _validate

    with pytest.raises(ValueError):
        _validate(1, 3)
    with pytest.raises(ValueError):
        _validate(64, 0)
    with pytest.raises(ValueError):
        _validate(64, 17)


def test_duckdb_bucket_fragment(spark, stream):
    import duckdb

    df, _ = stream
    con = duckdb.connect()
    con.register("t", df.toPandas())
    for r in range(D):
        frag = countmin_bucket_sql("key", r, W)
        for key, b in con.execute(f"SELECT key, {frag} FROM t").fetchall():
            assert b == _ref_bucket(key, r), (key, r)


def test_plan_shape(spark, stream):
    df, _ = stream
    sketch = countmin_build(df, "key", W, D)
    plan = (
        countmin_estimate(df, "key", sketch, W, D)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
