"""Product quantization (functions/pq.py): encode determinism and plan
shape, ADC+re-rank behavior, and the exactness limit (rerank = corpus
size degenerates to brute force, pinned row-for-row)."""

import pytest

from pyspark.sql import functions as F

from tools.ann_recall import make_clustered


@pytest.fixture(scope="module")
def small(spark):
    return make_clustered(spark, n=300, dim=64, n_clusters=12, noise=0.3).persist()



def test_codebooks_shape_and_determinism(spark, small):
    from spdb_spark.functions.pq import pq_codebooks

    cb1 = pq_codebooks(small, dim=64, m=8, n_codes=16)
    cb2 = pq_codebooks(small, dim=64, m=8, n_codes=16)
    assert cb1 == cb2  # md5 pick: bit-stable across runs
    assert len(cb1) == 8 and all(len(j) == 16 for j in cb1)
    assert all(len(vec) == 8 for j in cb1 for _cid, vec in j)
    assert [cid for cid, _ in cb1[0]] == list(range(16))
    with pytest.raises(ValueError, match="subspaces"):
        pq_codebooks(small, dim=64, m=7)


def test_encode_is_zero_exchange_projection(spark, small):
    from spdb_spark.functions.pq import pq_codebooks, pq_encode

    cb = pq_codebooks(small, dim=64, m=8, n_codes=16)
    codes = pq_encode(small, cb)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    rows = codes.collect()
    assert all(len(r["codes"]) == 8 for r in rows)
    assert all(0 <= c <= 15 for r in rows for c in r["codes"])


def test_full_rerank_equals_brute_force(spark, small):
    # with rerank >= corpus size every vector is an exact-rerank
    # candidate, so PQ output must equal brute force row for row —
    # pinning the candidate plumbing and the shared ordering protocol
    from spdb_spark.functions.pq import pq_topk
    from spdb_spark.functions.similarity import brute_force_topk

    queries = small.where(F.col("vec_id") % 60 == 0)
    got = sorted(
        map(tuple, pq_topk(small, queries, dim=64, k=5, rerank=300).collect())
    )
    want = sorted(map(tuple, brute_force_topk(small, queries, k=5).collect()))
    assert got == want and len(want) > 0


def test_pq_recall_floor_clustered(spark, clustered2k, truth2k):
    from tools.ann_recall import recall_at_k

    from spdb_spark.functions.pq import pq_topk

    # measured (SCALE.md): rerank is the dominant dial — 1.00 at
    # rerank=100 (a 20x candidate cut) even with 16 codes; 0.73 at
    # rerank=30; Lloyd refinement is recall-neutral on this fixture
    # (0.73 -> 0.72: the md5 pick already samples cluster members)
    corpus, truth = clustered2k, truth2k
    queries = corpus.where(F.col("vec_id") % 100 == 0)
    approx = pq_topk(corpus, queries, dim=64, k=10, m=8, n_codes=16, rerank=100)
    r = recall_at_k(approx, truth)
    assert r >= 0.9, f"pq recall@10 {r} (measured 1.0 at these settings)"


def test_refine_improves_or_preserves_quantization_error(spark, small):
    # Lloyd iterations must not INCREASE total quantization distortion
    # (k-means' objective is monotone non-increasing); recall on the
    # clustered fixture is re-rank-bound, so the objective is the
    # honest training signal to pin
    import numpy as np

    from spdb_spark.functions.pq import (
        pq_codebooks,
        pq_encode,
        refine_pq_codebooks,
    )

    def distortion(cb):
        codes = {r["vec_id"]: r["codes"] for r in pq_encode(small, cb).collect()}
        vecs = {r["vec_id"]: np.array(r["embedding"]) for r in small.collect()}
        tot = 0.0
        for vid, cs in codes.items():
            for j, c in enumerate(cs):
                sub = vecs[vid][j * 8 : (j + 1) * 8]
                cent = np.array(dict(cb[j])[c])
                tot += float(((sub - cent) ** 2).sum())
        return tot

    cb0 = pq_codebooks(small, dim=64, m=8, n_codes=16)
    cb1 = refine_pq_codebooks(small, cb0, iters=1)
    assert distortion(cb1) <= distortion(cb0) * (1 + 1e-9)


def test_ivfpq_full_probe_full_rerank_equals_brute_force(spark, small):
    # probing EVERY list makes every vector a candidate; rerank=corpus
    # then restores exact ordering — the composite must equal brute
    # force row for row (pins routing, residual encode, ADC plumbing)
    from spdb_spark.functions.pq import ivfpq_topk
    from spdb_spark.functions.similarity import brute_force_topk

    queries = small.where(F.col("vec_id") % 60 == 0)
    got = sorted(
        map(
            tuple,
            ivfpq_topk(
                small, queries, dim=64, k=5,
                n_centroids=8, n_probe=8, m=8, n_codes=16, rerank=300,
            ).collect(),
        )
    )
    want = sorted(map(tuple, brute_force_topk(small, queries, k=5).collect()))
    assert got == want and len(want) > 0


def test_indexed_ivfpq_matches_unindexed(spark, small, tmp_path):
    # the persisted layout (centroids + codebooks + codes partitioned by
    # centroid_id) must reproduce the in-memory composite bit-for-bit
    from spdb_spark.functions.pq import (
        ivfpq_topk,
        ivfpq_topk_indexed,
        save_ivfpq_index,
    )

    path = str(tmp_path / "ivfpq")
    save_ivfpq_index(small, path, dim=64, n_centroids=8, m=8, n_codes=16)
    queries = small.where(F.col("vec_id") % 60 == 0)
    got = sorted(
        map(
            tuple,
            ivfpq_topk_indexed(
                spark, path, queries, small, dim=64, k=5, n_probe=3, rerank=20
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            ivfpq_topk(
                small, queries, dim=64, k=5,
                n_centroids=8, n_probe=3, m=8, n_codes=16, rerank=20,
            ).collect(),
        )
    )
    assert got == want and len(want) > 0
    # probe pruning reaches the codes scan as a partition filter
    import os

    assert any(
        d.startswith("centroid_id=") for d in os.listdir(path + "/codes")
    )


def test_ivfpq_recall_floor_clustered(spark, clustered2k, truth2k):
    # measured (SCALE.md): 0.995 at 64 residual codes + rerank=100 on
    # the clustered corpus; the residual-code budget and re-rank margin
    # are the dials (n_probe mostly sets which cells are reachable)
    from tools.ann_recall import recall_at_k

    from spdb_spark.functions.pq import ivfpq_topk

    corpus, truth = clustered2k, truth2k
    queries = corpus.where(F.col("vec_id") % 100 == 0)
    approx = ivfpq_topk(
        corpus, queries, dim=64, k=10,
        n_centroids=16, n_probe=4, m=8, n_codes=64, rerank=100,
    )
    r = recall_at_k(approx, truth)
    assert r >= 0.9, f"ivfpq recall@10 {r} (measured 0.995 at these settings)"
