"""Crawl-frontier operators: sitemap ingestion and politeness
scheduling — the consumers of the robots.txt side-channels
(functions/robots.robots_sitemaps / robots_crawl_delays) that a crawl
pipeline runs BEFORE fetching: seed the frontier from each host's
sitemaps, then lay candidate URLs out on per-host fetch slots spaced by
the host's Crawl-delay.

Spark-first shape: sitemap parsing is regexp_extract_all + explode —
a scan-stage projection, no exchange (the sitemap table is
host-count-sized). Scheduling joins the host-count-sized delay table as
a BROADCAST map and assigns slots with ONE window over (host, url
order): a per-host fetch sequence is inherently a per-host total order,
so the window partitioning IS the semantics — the hot-host mitigation
is capping the frontier first (sources/crawl.cap_per_host, the salted
two-phase form), after which every host's partition is bounded by the
cap. Every step has a DuckDB twin, so the driver gate replays parse +
schedule exactly.

Reference-capability analogue: none (jhuapl-boss/spdb is voxel-only);
north-star crawl surface (SURVEY.md) beside sources/crawl.py and
functions/robots.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (?s) so multi-line <url> blocks match; non-greedy so adjacent blocks
# never merge. Both spellings are shared by Java regex and RE2.
_URL_BLOCK = r"(?s)<url\b[^>]*>.*?</url>"
_SITEMAP_BLOCK = r"(?s)<sitemap\b[^>]*>.*?</sitemap>"


def _field(block, tag: str):
    return F.nullif(
        F.trim(
            F.regexp_extract(
                block, rf"(?s)<{tag}[^>]*>\s*([^<]*?)\s*</{tag}>", 1
            )
        ),
        F.lit(""),
    )


def sitemap_urls(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Parse <urlset> sitemap XML -> one row per <url> entry:
    (*keep_cols, loc, lastmod, changefreq, priority double). Entries
    without a <loc> are dropped (nothing to fetch); the optional fields
    are NULL when absent. Plain-text fields only (no CDATA/entities —
    the overwhelmingly common machine-generated shape; an escaping
    sitemap needs a decode pass upstream). Narrow: regexp explode in
    the scan stage."""
    blocks = sitemaps.select(
        *keep_cols,
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_URL_BLOCK), 0)
        ).alias("_b"),
    )
    b = F.col("_b")
    return blocks.select(
        *keep_cols,
        _field(b, "loc").alias("loc"),
        _field(b, "lastmod").alias("lastmod"),
        _field(b, "changefreq").alias("changefreq"),
        # try_cast: junk <priority> values become NULL in both ANSI
        # modes, matching the twin's TRY_CAST (sitemap_urls_sql).
        _field(b, "priority").try_cast("double").alias("priority"),
    ).where(F.col("loc").isNotNull())


def sitemap_index_locs(
    sitemaps: DataFrame,
    xml_col: str = "xml",
    keep_cols: tuple[str, ...] = ("host",),
) -> DataFrame:
    """Parse <sitemapindex> XML -> (*keep_cols, loc, lastmod): the
    child sitemap URLs to fetch and feed back through sitemap_urls."""
    blocks = sitemaps.select(
        *keep_cols,
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_SITEMAP_BLOCK), 0)
        ).alias("_b"),
    )
    b = F.col("_b")
    return blocks.select(
        *keep_cols,
        _field(b, "loc").alias("loc"),
        _field(b, "lastmod").alias("lastmod"),
    ).where(F.col("loc").isNotNull())


def frontier_schedule(
    urls: DataFrame,
    delays: DataFrame | None = None,
    url_col: str = "url",
    default_delay_s: float = 1.0,
    start_s: float = 0.0,
) -> DataFrame:
    """Politeness schedule: assign each candidate URL a per-host fetch
    slot and timestamp — urls + (host, delay_s, slot, fetch_at_s) with
    slot numbering the host's URLs in url order (a deterministic pure
    function of the frontier: re-runs and repartitionings produce the
    identical schedule) and fetch_at_s = start_s + slot * delay_s.

    `delays` is the (host, delay_s) table robots_crawl_delays emits —
    host-count-sized, joined as a broadcast map; hosts without a
    directive fall back to `default_delay_s`. A frontier scheduler
    consumes this as \"host h may be fetched at start + k*delay\" —
    the RFC politeness contract laid out declaratively.

    The four output columns (host, delay_s, slot, fetch_at_s) REPLACE
    any same-named input column — host is always recomputed from
    `url_col` — so composing over sitemap_urls (which keeps its own
    host) never yields an ambiguous duplicate."""
    from pyspark.sql import Window

    from spdb_spark.functions.url import url_host

    _mine = ("host", "delay_s", "slot", "fetch_at_s")
    out_cols = [c for c in urls.columns if c not in _mine]
    d = urls.select(*out_cols).withColumn("host", url_host(F.col(url_col)))
    if delays is not None:
        d = d.join(
            F.broadcast(
                delays.select("host", F.col("delay_s").alias("_fs_delay"))
            ),
            "host",
            "left",
        )
        delay = F.coalesce(F.col("_fs_delay"), F.lit(float(default_delay_s)))
    else:
        delay = F.lit(float(default_delay_s))
    w = Window.partitionBy("host").orderBy(F.col(url_col))
    return d.select(
        *out_cols,
        F.col("host"),
        delay.alias("delay_s"),
        (F.row_number().over(w) - 1).cast("long").alias("slot"),
        (F.lit(float(start_s)) + (F.row_number().over(w) - 1) * delay).alias(
            "fetch_at_s"
        ),
    )


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def sitemap_urls_sql(
    sitemaps_cte: str,
    xml_expr: str = "xml",
    keep_exprs: str = "host",
) -> str:
    """SELECT <keep_exprs>, loc, lastmod, changefreq, priority —
    exactly sitemap_urls() over `sitemaps_cte`."""

    def fld(tag: str) -> str:
        return (
            f"nullif(trim(regexp_extract(b, "
            f"'(?s)<{tag}[^>]*>\\s*([^<]*?)\\s*</{tag}>', 1)), '')"
        )

    return f"""(
WITH sm_blocks AS (
  SELECT {keep_exprs},
         unnest(regexp_extract_all({xml_expr}, '{_URL_BLOCK}')) AS b
  FROM {sitemaps_cte}
)
SELECT {keep_exprs},
       {fld("loc")} AS loc,
       {fld("lastmod")} AS lastmod,
       {fld("changefreq")} AS changefreq,
       TRY_CAST({fld("priority")} AS DOUBLE) AS priority
FROM sm_blocks
WHERE {fld("loc")} IS NOT NULL
)"""


def frontier_schedule_sql(
    urls_cte: str,
    delays_cte: str | None,
    url_expr: str = "url",
    default_delay_s: float = 1.0,
    start_s: float = 0.0,
    drop_cols: tuple[str, ...] = (),
) -> str:
    """SELECT <urls_cte>.*, host, delay_s, slot, fetch_at_s — exactly
    frontier_schedule(). `delays_cte` exposes (host, delay_s) or is
    None for the uniform default. `drop_cols` mirrors the Python
    side's replace-on-collision: list any of host/delay_s/slot/
    fetch_at_s the urls_cte already carries so they are EXCLUDEd
    before the computed columns are appended."""
    from spdb_spark.functions.url import url_host_sql

    if delays_cte is not None:
        join = f"LEFT JOIN {delays_cte} dl USING (host)"
        delay = f"coalesce(dl.delay_s, {float(default_delay_s)})"
    else:
        join = ""
        delay = str(float(default_delay_s))
    ex = f" EXCLUDE ({', '.join(drop_cols)})" if drop_cols else ""
    return f"""(
WITH fs_urls AS (
  SELECT u.*{ex}, {url_host_sql(url_expr)} AS host FROM {urls_cte} u
),
fs_joined AS (
  SELECT fs_urls.*, {delay} AS _delay
  FROM fs_urls {join}
)
SELECT * EXCLUDE (_delay, _slot),
       _delay AS delay_s,
       _slot AS slot,
       {float(start_s)} + _slot * _delay AS fetch_at_s
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY host ORDER BY {url_expr}
  ) - 1 AS _slot
  FROM fs_joined
)
)"""
