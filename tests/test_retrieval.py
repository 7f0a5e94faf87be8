"""Retrieval operator properties: cosine bounds, BM25 monotonicity in tf,
length normalization direction."""

from pyspark.sql import functions as F

from spdb_spark.functions.retrieval import bm25_scores, tfidf_cosine, tfidf_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_cosine_bounds_and_self_exclusion(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),       # exact dup of 1
            (3, "alpha beta delta"),
            (4, "epsilon zeta eta"),        # disjoint from 1
        ],
    )
    w = tfidf_weights(docs, "doc_id", "text")
    probes = docs.select(F.col("doc_id").alias("doc")).where(F.col("doc") == 1)
    sims = {r.doc_id: r.sim for r in tfidf_cosine(w, probes).collect()}
    assert 1 not in sims                      # probe never pairs with itself
    assert all(0.0 <= s <= 1.0 for s in sims.values())
    # identical doc maxes the score; sharing 2/3 terms beats disjoint
    if 2 in sims:
        assert sims[2] == max(sims.values())
    assert sims.get(4, 0.0) == 0.0 or 4 not in sims


def test_bm25_monotone_in_tf_and_length_normalized(spark):
    docs = _docs(
        spark,
        [
            (1, "scan alpha beta gamma"),
            (2, "scan scan alpha beta"),          # same length, higher tf
            (3, "scan alpha beta gamma delta epsilon zeta eta"),  # longer, same tf
        ],
    )
    scores = {r.doc_id: r.score for r in bm25_scores(docs, "doc_id", "text", ["scan"]).collect()}
    assert scores[2] > scores[1]   # more occurrences -> higher score
    assert scores[1] > scores[3]   # same tf in a longer doc -> lower score
    assert all(s >= 0 for s in scores.values())
