"""ANN recall harness: measured recall@k of the approximate top-k
engines (IVF, hyperplane LSH, int8 quantized re-rank) against the
brute-force oracle, swept over their cost dials.

The correctness gates pin each engine's output exactly at fixed
settings; this harness substantiates the SCALE claim — "bucketed, not
all-pairs" — with numbers: how much recall each pruning level buys, so
a deployment can pick nlist/nprobe (IVF), planes/tables (LSH), or the
re-rank margin (SQ8) from data instead of folklore. A pytest floor
(tests/test_ann_recall.py) pins recall@10 >= 0.9 at the documented
settings so a regression in list assignment / signatures / re-rank
margins fails loudly.

Usage: python tools/ann_recall.py [sf_dir|--clustered] [k]
Prints one markdown table per engine (the SCALE.md format) plus a JSON
line for machine diffing.

`--clustered` swaps the driver fixture for a synthetic corpus WITH
cluster structure (Gaussian blobs around unit-norm centroids). The
driver's embeddings table is isotropic random (measured: intra-label
cosine 0.003 vs inter -0.005 — no structure), on which cell-probing
methods CANNOT beat ~n_probe/n_centroids recall no matter the
implementation; real text/image embeddings cluster, which is the
geometry IVF/LSH exist for. Measuring both separates "the pruning is
wrong" from "the data has nothing to prune toward".
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _truth_sets(df) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(int(r["query_id"]), set()).add(int(r["neighbor_id"]))
    return out


def recall_at_k(approx, truth: dict[int, set[int]]) -> float:
    """Mean over queries of |approx ∩ truth| / |truth|. Queries the
    approximate engine returns NOTHING for still count (recall 0) —
    dropping them would overstate pruned configurations."""
    got = _truth_sets(approx)
    if not truth:
        return float("nan")
    return sum(
        len(got.get(q, set()) & t) / len(t) for q, t in truth.items()
    ) / len(truth)


def make_clustered(spark, n: int = 2000, dim: int = 64,
                   n_clusters: int = 40, noise: float = 0.3, seed: int = 7):
    """Synthetic embeddings WITH cluster structure: unit-norm centroids +
    Gaussian noise. Deterministic; shared by the harness and the pytest
    recall floor."""
    import numpy as np

    rng = np.random.default_rng(seed)
    cents = rng.standard_normal((n_clusters, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.integers(0, n_clusters, n)
    vecs = cents[labels] + noise * rng.standard_normal((n, dim)) / dim**0.5
    rows = [
        (i, int(labels[i]), [float(x) for x in vecs[i]]) for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from spdb_spark.functions.ivf import ivf_topk
    from spdb_spark.functions.quantize import quantized_topk
    from spdb_spark.functions.similarity import brute_force_topk, lsh_topk
    from spdb_spark.session import get_spark, load_tables

    spark = get_spark("ann_recall")
    spark.sparkContext.setLogLevel("ERROR")
    if sf_dir == "--clustered":
        embs = make_clustered(spark)
        sf_dir = "clustered(n=2000,dim=64,40 blobs,noise=0.3)"
    else:
        embs = load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]
    dim = len(embs.select("embedding").first()[0])
    queries = embs.where(F.col("vec_id") % 100 == 0).persist()
    corpus = embs.persist()
    n_corpus, n_queries = corpus.count(), queries.count()

    truth = _truth_sets(brute_force_topk(corpus, queries, k=k))
    results: list[dict] = []

    def run(engine: str, settings: dict, df) -> None:
        t0 = time.perf_counter()
        r = recall_at_k(df, truth)
        wall = time.perf_counter() - t0
        results.append(
            {"engine": engine, **settings, "recall": round(r, 4),
             "wall_sec": round(wall, 2)}
        )

    for n_centroids in (16, 64):
        for n_probe in (1, 2, 4, 8):
            run(
                "ivf",
                {"n_centroids": n_centroids, "n_probe": n_probe},
                ivf_topk(
                    corpus, queries, k=k,
                    n_centroids=n_centroids, n_probe=n_probe,
                ),
            )
    for n_planes in (4, 8):
        for n_tables in (4, 8, 16):
            run(
                "lsh",
                {"n_planes": n_planes, "n_tables": n_tables},
                lsh_topk(
                    corpus, queries, dim, k=k,
                    n_planes=n_planes, n_tables=n_tables,
                ),
            )
    for rerank in (k, 3 * k):
        run(
            "sq8",
            {"rerank": rerank},
            quantized_topk(corpus, queries, k=k, rerank=rerank),
        )
    from spdb_spark.functions.pq import pq_topk

    for n_codes in (16, 64):
        for rerank in (k, 3 * k):
            run(
                "pq",
                {"n_codes": n_codes, "rerank": rerank},
                pq_topk(
                    corpus, queries, dim=dim, k=k, m=8,
                    n_codes=n_codes, rerank=rerank,
                ),
            )

    from spdb_spark.functions.pq import ivfpq_topk

    # the residual-code budget and the re-rank margin are IVF-PQ's two
    # quality dials (n_probe mostly sets which cells are REACHABLE):
    for n_codes, rerank in ((16, 3 * k), (64, 3 * k), (64, 10 * k)):
        run(
            "ivfpq",
            {"n_centroids": 16, "n_probe": 4, "n_codes": n_codes,
             "rerank": rerank},
            ivfpq_topk(
                corpus, queries, dim=dim, k=k,
                n_centroids=16, n_probe=4, m=8, n_codes=n_codes,
                rerank=rerank,
            ),
        )

    for engine in ("ivf", "lsh", "sq8", "pq", "ivfpq"):
        rows = [r for r in results if r["engine"] == engine]
        keys = [c for c in rows[0] if c not in ("engine", "recall", "wall_sec")]
        print(f"\n## {engine} recall@{k} ({n_corpus} vectors, "
              f"{n_queries} queries, dim {dim}, {sf_dir})\n")
        print("| " + " | ".join(keys + ["recall", "wall (s)"]) + " |")
        print("|" + "---|" * (len(keys) + 2))
        for r in rows:
            cells = [str(r[c]) for c in keys] + [f"{r['recall']:.3f}",
                                                 f"{r['wall_sec']:.2f}"]
            print("| " + " | ".join(cells) + " |")
    print()
    print(json.dumps({"sf_dir": sf_dir, "k": k, "n_corpus": n_corpus,
                      "n_queries": n_queries, "results": results}))


if __name__ == "__main__":
    main()
