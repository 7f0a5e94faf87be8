"""Recall floors for the approximate-NN engines (tools/ann_recall.py
is the measuring harness; SCALE.md records the full sweep).

The floors run on a CLUSTERED synthetic corpus (Gaussian blobs around
unit-norm centroids) because that is the geometry ANN pruning exploits:
the driver's embeddings table is measured isotropic (intra-label cosine
0.003 vs inter -0.005), where cell-probing recall is bounded by
~n_probe/n_centroids for ANY correct implementation. A regression in
list assignment, LSH signatures, or the SQ8 re-rank margin drops these
floors loudly; exactness at fixed settings is pinned separately by the
driver gates."""

from tools.ann_recall import make_clustered, recall_at_k, _truth_sets

from pyspark.sql import functions as F


def _fixture(spark):
    embs = make_clustered(spark, n=2000, dim=64, n_clusters=40, noise=0.3)
    queries = embs.where(F.col("vec_id") % 100 == 0)
    return embs, queries


def test_ivf_recall_floor(spark):
    from spdb_spark.functions.ivf import ivf_topk
    from spdb_spark.functions.similarity import brute_force_topk

    corpus, queries = _fixture(spark)
    truth = _truth_sets(brute_force_topk(corpus, queries, k=10))
    approx = ivf_topk(corpus, queries, k=10, n_centroids=16, n_probe=2)
    r = recall_at_k(approx, truth)
    assert r >= 0.9, f"ivf recall@10 {r} (measured 0.985 at these settings)"


def test_lsh_recall_floor(spark):
    from spdb_spark.functions.similarity import brute_force_topk, lsh_topk

    corpus, queries = _fixture(spark)
    truth = _truth_sets(brute_force_topk(corpus, queries, k=10))
    approx = lsh_topk(corpus, queries, 64, k=10, n_planes=8, n_tables=8)
    r = recall_at_k(approx, truth)
    assert r >= 0.9, f"lsh recall@10 {r} (measured 0.985 at these settings)"


def test_sq8_rerank_recall_floor(spark):
    from spdb_spark.functions.quantize import quantized_topk
    from spdb_spark.functions.similarity import brute_force_topk

    corpus, queries = _fixture(spark)
    truth = _truth_sets(brute_force_topk(corpus, queries, k=10))
    approx = quantized_topk(corpus, queries, k=10, rerank=30)
    r = recall_at_k(approx, truth)
    assert r >= 0.99, f"sq8 recall@10 {r} (measured 1.0 at these settings)"
