"""Hashed n-gram linear text classifier — the fastText-style quality
filter of the public pretraining recipes (CCNet's LM-vs-web classifier,
the LLaMA "reference-like page" filter), as two Spark-first pieces:

- `nb_classifier_weights`: ONE-PASS training. For binary labels the
  Naive-Bayes log-odds weight of a hashed feature bucket is exactly the
  DSIR log-ratio of positive vs negative bucket distributions
  (functions/dsir.py — same Laplace smoothing, same hashed
  unigram+bigram features), so training is two bucket-count aggregates
  + a broadcast-sized join: n_buckets rows out, no corpus shuffle.
  Deployments with an externally trained model (real fastText) skip
  this and supply their own (bucket, weight) table.
- `linear_text_classifier`: INFERENCE. Features are one projection +
  one explode (hashing.md5_long buckets — oracle-replayable); weights
  broadcast-join onto the exploded grams; the per-doc mean + bias +
  sigmoid is one partial-agg groupBy(doc) carrying (doc, partial sums),
  not text. The single corpus-sized exchange in the pipeline.

Mean pooling matches fastText (average of feature embeddings into the
linear layer); grams whose bucket carries no weight contribute 0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.dsir import dsir_bucket_logratio, hashed_grams


def nb_classifier_weights(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """(bucket, weight): Laplace-smoothed Naive-Bayes log-odds of the
    positive class per hashed unigram+bigram bucket. At most n_buckets
    rows — always broadcastable."""
    return dsir_bucket_logratio(
        neg_docs, pos_docs, id_col, text_col, n_buckets, alpha
    ).select("bucket", F.col("logratio").alias("weight"))


def linear_text_classifier(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    bias: float = 0.0,
) -> DataFrame:
    """(id, n_grams, score, prob): score = bias + mean bucket weight of
    the doc's hashed grams, prob = sigmoid(score). Docs with zero grams
    are absent (no features, no prediction) — filter upstream if every
    doc needs a row."""
    feats = hashed_grams(docs, id_col, text_col, n_buckets)
    w = F.broadcast(weights.select("bucket", "weight"))
    scored = feats.join(w, "bucket", "left").select(
        id_col, F.coalesce("weight", F.lit(0.0)).alias("w")
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        (F.lit(bias) + F.sum("w") / F.count("*")).alias("score"),
    )
    return agg.select(
        id_col,
        "n_grams",
        "score",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))).alias("prob"),
    )
