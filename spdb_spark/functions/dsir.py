"""DSIR-style data selection: importance resampling over hashed n-gram
features (Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — public method). Given a RAW crawl corpus and
a small TARGET corpus exemplifying the desired distribution, score every
raw document by how much more likely its hashed unigram+bigram features
are under the target than under the raw distribution, then resample
proportionally to the importance weight. This is the standard
pretraining-data curation step between quality filtering and dedup.

Spark shape (the part that matters at 100 TB):

- Feature extraction is one projection + one explode — linear in tokens,
  no shuffle. Buckets use the same md5-derived hash as the rest of the
  suite (`hashing.md5_long`), so the DuckDB oracle replays it exactly.
- The two bucket tables (raw / target counts) are `n_buckets` rows each
  — KB-scale regardless of corpus size; their log-ratio join is a
  broadcast, never a shuffle of the corpus.
- Per-document weights are one partial-agg groupBy(doc) — the single
  corpus-sized shuffle in the pipeline, and it carries (doc, partial
  sum) pairs, not text.
- Resampling is the Gumbel top-k trick keyed on a DETERMINISTIC
  md5-derived uniform, so the sample is a pure function of the corpus +
  seed: re-runs, repartitioning, and speculative retries agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.hashing import md5_long
from spdb_spark.functions.text import tokens, word_ngrams


def hashed_grams(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    """(id, bucket) — one row per unigram AND bigram occurrence, bucketed
    by md5 mod n_buckets. Linear, shuffle-free (explode preserves
    partitioning)."""
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    grams = toks.select(
        id_col,
        F.explode(
            F.concat(F.col("_toks"), word_ngrams(F.col("_toks"), 2))
        ).alias("gram"),
    )
    return grams.select(
        id_col, F.pmod(md5_long(F.col("gram")), F.lit(n_buckets)).alias("bucket")
    )


def dsir_bucket_logratio(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit the importance model: (bucket, logratio) where logratio =
    log p_target(bucket) - log p_raw(bucket), both Laplace-smoothed with
    `alpha` over `n_buckets`. The result is n_buckets rows at most —
    always broadcastable."""
    raw_b = hashed_grams(raw_docs, id_col, text_col, n_buckets)
    tgt_b = hashed_grams(target_docs, id_col, text_col, n_buckets)
    cr = raw_b.groupBy("bucket").agg(F.count("*").alias("cr"))
    ct = tgt_b.groupBy("bucket").agg(F.count("*").alias("ct"))
    joined = cr.join(ct, "bucket", "full_outer").na.fill(0, ["cr", "ct"])
    # Totals derive from the BUCKET tables, not from separate corpus
    # aggregates: tr = sum of per-bucket raw counts (every gram lands in
    # exactly one bucket), computed with an unpartitioned window over
    # `joined` — which is <= n_buckets rows BY CONSTRUCTION, so the
    # single-partition window is KB-scale at any corpus size (unlike a
    # corpus- or vocab-sized window, which the plan tests forbid). The
    # old form ran raw_b.agg(count) / tgt_b.agg(count) as their own
    # subtrees, re-running the whole tokenize+explode+hash pass per
    # total: 4 corpus passes where 2 suffice (5 -> 3 for the classifier
    # gate, which adds the inference pass). Sum of counts == count, and
    # full-outer keeps every bucket either side produced (fill-0 adds
    # zeros), so the totals are value-identical.
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    tr = F.sum("cr").over(w_all)
    tt = F.sum("ct").over(w_all)
    b = float(n_buckets) * alpha
    return joined.select(
        "bucket",
        (
            F.log((F.col("ct") + alpha) / (tt + b))
            - F.log((F.col("cr") + alpha) / (tr + b))
        ).alias("logratio"),
    )


def dsir_weights(
    docs: DataFrame,
    logratio: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, log_weight, n_grams): per-document log importance weight =
    sum of the logratio of each n-gram occurrence's bucket. One broadcast
    join (the logratio table is <= n_buckets rows) and one partial-agg
    groupBy — the only corpus shuffle."""
    grams = hashed_grams(docs, id_col, text_col, n_buckets)
    return (
        grams.join(F.broadcast(logratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("logratio").alias("log_weight"),
            F.count("*").alias("n_grams"),
        )
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Gumbel top-k: sample `k` ids WITHOUT replacement with probability
    proportional to exp(log_weight), deterministically — the Gumbel noise
    derives from md5(id, seed), not an RNG, so the selected set is a pure
    function of (weights, k, seed). One TakeOrdered (no full sort)."""
    # u in (0, 1]: md5-derived 60-bit uniform, never exactly 0
    u = (md5_long(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))) + 1) / float(1 << 60)
    gumbel = -F.log(-F.log(u))
    keyed = weights.select(
        id_col, "log_weight", (F.col("log_weight") + gumbel).alias("_key")
    )
    return (
        keyed.orderBy(F.col("_key").desc(), F.col(id_col))
        .limit(k)
        .drop("_key")
    )
