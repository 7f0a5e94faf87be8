"""DSIR importance-resampling tests: weights pinned against an
independent numpy re-implementation, selection semantics (target-like
docs score higher), deterministic Gumbel resampling, and the broadcast
plan shape."""

import hashlib
import math

import numpy as np
import pytest

from spdb_spark.functions.dsir import (
    dsir_bucket_logratio,
    dsir_resample,
    dsir_weights,
)

RAW = [
    (0, "the cat sat on the mat"),
    (1, "stock market prices fell sharply today"),
    (2, "the dog sat on the rug"),
    (3, "buy cheap pills online now"),
    (4, "the cat and the dog sat"),
    (5, "market prices rose in early trading"),
]
TARGET = [(100, "the cat sat"), (101, "the dog sat on the mat")]
B = 64


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    toks = text.strip().lower().split()
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _ref_weights() -> dict[int, tuple[float, int]]:
    """Independent re-implementation with plain dicts."""
    raw_counts: dict[int, int] = {}
    tgt_counts: dict[int, int] = {}
    for _i, text in RAW:
        for g in _grams(text):
            raw_counts[_md5_long(g) % B] = raw_counts.get(_md5_long(g) % B, 0) + 1
    for _i, text in TARGET:
        for g in _grams(text):
            tgt_counts[_md5_long(g) % B] = tgt_counts.get(_md5_long(g) % B, 0) + 1
    tr = sum(raw_counts.values())
    tt = sum(tgt_counts.values())
    out = {}
    for i, text in RAW:
        lw, n = 0.0, 0
        for g in _grams(text):
            bkt = _md5_long(g) % B
            lw += math.log((tgt_counts.get(bkt, 0) + 1.0) / (tt + B)) - math.log(
                (raw_counts.get(bkt, 0) + 1.0) / (tr + B)
            )
            n += 1
        out[i] = (lw, n)
    return out


def _spark_weights(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    lr = dsir_bucket_logratio(raw, tgt, n_buckets=B)
    return dsir_weights(raw, lr, n_buckets=B)


def test_weights_match_reference(spark):
    got = {
        r["doc_id"]: (r["log_weight"], r["n_grams"])
        for r in _spark_weights(spark).collect()
    }
    want = _ref_weights()
    assert set(got) == set(want)
    for i in want:
        assert got[i][1] == want[i][1], i
        assert got[i][0] == pytest.approx(want[i][0], abs=1e-9), i


def test_target_like_docs_score_higher(spark):
    got = {r["doc_id"]: r["log_weight"] for r in _spark_weights(spark).collect()}
    per_gram = {i: got[i] / len(_grams(t)) for i, t in RAW}
    # docs sharing the target's vocabulary beat the off-distribution ones
    assert min(per_gram[0], per_gram[2], per_gram[4]) > max(
        per_gram[1], per_gram[3], per_gram[5]
    )


def test_resample_deterministic_and_biased(spark):
    w = _spark_weights(spark)
    s1 = [r["doc_id"] for r in dsir_resample(w, 3, seed=7).collect()]
    s2 = [r["doc_id"] for r in dsir_resample(w, 3, seed=7).collect()]
    assert s1 == s2 and len(s1) == 3 and len(set(s1)) == 3
    # a dominating weight is always selected: +50 nats beats any Gumbel
    # draw the md5 uniform can produce (|G| < -ln(-ln(1/2^60)) ~ 3.7)
    boosted = w.withColumn(
        "log_weight",
        w["log_weight"] + (w["doc_id"] == 3).cast("double") * 50.0,
    )
    for seed in range(5):
        assert 3 in {
            r["doc_id"] for r in dsir_resample(boosted, 2, seed=seed).collect()
        }


def test_plan_broadcasts_the_logratio(spark):
    plan = _spark_weights(spark)._jdf.queryExecution().executedPlan().toString()
    # the corpus-sized side (exploded grams) joins the logratio table via
    # broadcast — never a shuffle of the grams
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # the only sort-merge join allowed is the full-outer of the two
    # bucket-count tables inside the fit (<= n_buckets rows each)
    assert plan.count("SortMergeJoin") <= 1
    if "SortMergeJoin" in plan:
        assert "FullOuter" in plan
