"""Streaming corpus curation: continuous quality verdicts and a windowed
domain-mixture monitor over a document stream.

Reference parity: the reference has no stream processing (SURVEY §2.8) —
this is the north-star streaming counterpart of the batch curation ops
(`functions/pipeline.quality_filter`, `functions/sampling.mixture_plan`):
the pipeline that ingests a crawl feed and continuously (a) attaches
quality verdicts and (b) reports per-source token share over event-time
windows, tolerating late arrivals via watermark.

Scale notes (100 TB/day feeds):
- The quality stage is stateless (pure projection) — it adds zero state
  and scales with input partitions.
- The mixture monitor is a windowed agg: state = (windows in the
  watermark horizon) x (domains), tiny regardless of corpus rate, and the
  shuffle carries partial sums (map-side combine applies per micro-batch).
- Output is append-mode on window close, so downstream consumers see one
  final row per (window, source) — the shape a mixture-rebalancing
  controller consumes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions import text as T


def quality_stream(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach streaming-safe quality columns (token count, mean token
    length, quality score, language) — stateless, works identically on
    batch and streaming frames."""
    c = F.col(text_col)
    return df.select(
        "*",
        T.token_count(c).alias("n_tokens"),
        T.quality_score(c).alias("quality"),
        T.lang_id(c).alias("pred_lang"),
    )


def mixture_monitor(
    df: DataFrame,
    ts_col: str = "ts",
    domain_col: str = "source",
    text_col: str = "text",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-(event-time window, domain) doc and token counts. Streaming
    input: watermarked windowed agg (append on window close). Batch
    input: the same expression without the watermark, which is how tests
    cross-check stream output against batch truth."""
    toks = T.token_count(F.col(text_col))
    base = df.select(F.col(ts_col), F.col(domain_col).alias("domain"), toks.alias("tok"))
    if df.isStreaming:
        base = base.withWatermark(ts_col, watermark)
    return (
        base.groupBy(F.window(F.col(ts_col), window).alias("win"), "domain")
        .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("tokens"))
        .select(
            F.col("win.start").alias("win_start"),
            "domain",
            "n_docs",
            "tokens",
        )
    )


def curate_crawl_stream(
    df: DataFrame,
    text_col: str = "text",
    url_col: str = "source",
    suffix_rules: tuple[str, ...] | None = None,
) -> DataFrame:
    """Stateless crawl-curation columns for an unbounded document
    stream: the published C4 line/page verdict, the Gopher hard-rule
    verdict, and the registered domain (eTLD+1) — each a pure Column
    projection, so the stage adds ZERO streaming state and works
    identically on batch and streaming frames.

    The registered domain uses `domains.registered_domain_expr` (rule
    table inlined as a literal map): the batch path's distinct-host +
    broadcast map (`with_registered_domain`) is a stateful aggregation
    on a stream. Full published-PSL deployments should attach domains
    per micro-batch via foreachBatch(with_registered_domain) instead —
    this inline form fits snapshot/allowlist-sized rule tables."""
    from spdb_spark.functions.c4 import c4_filter
    from spdb_spark.functions.domains import (
        DEFAULT_SUFFIX_RULES,
        registered_domain_expr,
    )
    from spdb_spark.functions.quality import gopher_filter
    from spdb_spark.functions.url import url_host

    c = F.col(text_col)
    host = url_host(F.col(url_col))
    rules = suffix_rules if suffix_rules is not None else DEFAULT_SUFFIX_RULES
    return df.select(
        "*",
        c4_filter(c).alias("c4_keep"),
        gopher_filter(c).alias("gopher_keep"),
        registered_domain_expr(host, rules).alias("domain"),
    )
