"""Quality-filter pipeline: the dedup-then-filter document triage every
large-scale pretraining corpus build runs (CCNet/Gopher-style rules),
composed from the Column-pure text operators in `functions/text.py`.

Each document gets a verdict: `keep` plus the FIRST failing rule in a
fixed order (`reject_reason`, 'kept' when none fire). First-fail
ordering makes reject counts a partition of the corpus — the numbers a
pipeline report actually wants — and keeps the verdict deterministic
across engines.

Everything is one projection over the docs scan (whole-stage codegen,
no shuffle): every rule is a Column expression over token stats.
Thresholds compare FLOOR(x*1e6)/1e6-scaled doubles so a boundary
document gets the same verdict from Spark and the DuckDB oracle (the
raw doubles are bit-identical — single divisions and fixed-order
affine combinations — and floor-scaling is deterministic where ROUND
tie-breaking is not).

The dedup rule is injected, not computed here: pass `drop_ids` (e.g.
the `id_b` side of `minhash_lsh_dedup` pairs, or an exact-dup group's
non-keepers) and those docs reject as 'near_dup' before any text rule
runs — dedup-before-filter, the standard pipeline order. The join is
broadcast (the drop list is pair-output-sized, tiny next to the
corpus), so the pipeline stays shuffle-free end to end at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions import text as T

RULE_ORDER = (
    "near_dup",
    "too_short",
    "too_long",
    "bad_token_len",
    "low_stopword",
    "non_target_lang",
    "low_quality",
)


def _fl6(c):
    return F.floor(c * 1000000) / 1000000


def quality_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    drop_ids: DataFrame | None = None,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    mean_tok_len_bounds: tuple[float, float] = (3.0, 10.0),
    min_stop_ratio: float = 0.01,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
) -> DataFrame:
    """Per-document verdict table: (id, n_tokens, mean_tok_len,
    stop_ratio, quality, pred_lang, reject_reason, keep).

    `drop_ids` (optional, one column named `id_col`) rejects as
    'near_dup' ahead of the text rules. Defaults are Gopher-flavored;
    callers tune per corpus.
    """
    c = F.col(text_col)
    # ONE token split and ONE whitespace-strip per row, staged behind a
    # projection barrier (multi-referenced non-cheap columns survive
    # CollapseProject) — the five signals below would otherwise each
    # carry their own split of the same text (lang_id, stop_ratio,
    # quality, n_tokens, mean_tok_len: 5+ splits per row).
    toked = docs.select(
        id_col,
        T.tokens(c).alias("_tk"),
        F.length(F.regexp_replace(F.trim(c), r"\s+", "")).alias("_ch"),
    )
    tk, ch = F.col("_tk"), F.col("_ch")
    stats = toked.select(
        id_col,
        F.size(tk).cast("long").alias("n_tokens"),
        _fl6((ch / F.size(tk).cast("long")).cast("double")).alias(
            "mean_tok_len"
        ),
        _fl6(T._stopword_ratio_from_tokens(tk)).alias("stop_ratio"),
        _fl6(T._quality_from_tokens(tk, ch)).alias("quality"),
        T._lang_from_tokens(tk).alias("pred_lang"),
    )
    if drop_ids is not None:
        marks = drop_ids.select(id_col).distinct().withColumn(
            "near_dup", F.lit(True)
        )
        stats = stats.join(F.broadcast(marks), id_col, "left").withColumn(
            "near_dup", F.coalesce("near_dup", F.lit(False))
        )
    else:
        stats = stats.withColumn("near_dup", F.lit(False))

    lo, hi = mean_tok_len_bounds
    fails = {
        "near_dup": F.col("near_dup"),
        "too_short": F.col("n_tokens") < min_tokens,
        "too_long": F.col("n_tokens") > max_tokens,
        "bad_token_len": (F.col("mean_tok_len") < lo) | (F.col("mean_tok_len") > hi),
        "low_stopword": F.col("stop_ratio") < min_stop_ratio,
        "non_target_lang": ~F.col("pred_lang").isin(*langs),
        "low_quality": F.col("quality") < min_quality,
    }
    reason = F.lit("kept")
    for name in reversed(RULE_ORDER):
        reason = F.when(fails[name], F.lit(name)).otherwise(reason)
    return stats.select(
        id_col,
        "n_tokens",
        "mean_tok_len",
        "stop_ratio",
        "quality",
        "pred_lang",
        reason.alias("reject_reason"),
        (reason == "kept").cast("long").alias("keep"),
    )


def quality_report(verdicts: DataFrame) -> DataFrame:
    """Corpus-level pipeline report from `quality_filter` output:
    one row per reject_reason with doc and token totals. Because
    first-fail reasons partition the corpus, the rows sum to the whole
    input — the sanity property a triage report needs."""
    return verdicts.groupBy("reject_reason").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
