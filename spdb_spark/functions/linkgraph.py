"""Host link graph from crawled HTML — the Common-Crawl-shaped path
from raw pages to the weighted eTLD+1 edge list that PageRank /
HyperBall (functions/graph.py) consume and curation uses as a quality
prior (sources/crawl.crawl_to_corpus rank_prior).

Pipeline, per page: extract href targets (functions/html.py
html_href_targets — projection in the scan stage), resolve each against
the page URL (functions/url.url_resolve), keep http/https, take the
host, collapse both endpoints to registered domains (functions/
domains.py: distinct-host broadcast map — the corpus is never shuffled
for the PSL join), and count (src_domain, dst_domain) pairs.

Scale shape: extraction/resolution/host are pure Column expressions
inside the scan; the href explode is narrow; the ONLY corpus-keyed
exchanges are the distinct over hosts (small: hosts ≪ links) and the
final map-side-combined groupBy on (src_domain, dst_domain) — whose
output is graph-sized, not crawl-sized. At 100 TB the edge list a
1000-executor job shuffles is the ~100M-host graph, kilobytes per
task, exactly how the published Common Crawl host graph is built.

Reference-capability analogue: none (jhuapl-boss/spdb is voxel-only);
north-star crawl surface (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def page_links(
    pages: DataFrame, url_col: str = "page_url", html_col: str = "html"
) -> DataFrame:
    """One row per extracted link: (page_url, link_url, dst_host) with
    link_url resolved absolute and filtered to http/https. Narrow
    (projection + explode) — no exchange."""
    from spdb_spark.functions.html import html_href_targets
    from spdb_spark.functions.url import (
        url_host,
        url_resolve_from_parts,
        url_resolve_parts,
    )

    # Base-URL regex pieces are hoisted BEFORE the explode: computed once
    # per page, not once per link (fan-out× fewer regex evaluations; the
    # resolve branch per link is CASE + concat only). Output identical to
    # url_resolve(page_url, href).
    exploded = pages.select(
        F.col(url_col).alias("page_url"),
        *url_resolve_parts(F.col(url_col)),
        F.explode(html_href_targets(F.col(html_col))).alias("href"),
    )
    out = exploded.select(
        "page_url",
        url_resolve_from_parts(F.col("href")).alias("link_url"),
    ).where(F.col("link_url").rlike(r"^(?i)https?://"))
    return out.select(
        "page_url", "link_url", url_host(F.col("link_url")).alias("dst_host")
    ).where(F.col("dst_host") != "")


def host_graph_edges(
    pages: DataFrame,
    url_col: str = "page_url",
    html_col: str = "html",
    rules: DataFrame | None = None,
    drop_self: bool = True,
) -> DataFrame:
    """(page_url, html) pages -> weighted registered-domain edges
    (src_domain, dst_domain, weight). Hosts that ARE a public suffix
    (registered domain NULL) fall back to the bare host so platform
    pages still appear in the graph. drop_self removes intra-domain
    edges (the published host-graph convention — self-loops only re-feed
    a node its own rank)."""
    from spdb_spark.functions.domains import host_registered_domains
    from spdb_spark.functions.url import url_host

    links = page_links(pages, url_col, html_col).select(
        url_host(F.col("page_url")).alias("src_host"), "dst_host"
    )
    # Collapse to HOST-pair counts FIRST: the one crawl-sized aggregation
    # (map-side combined), after which everything — the distinct-host
    # set, the PSL mapping, both domain joins, the final domain-pair
    # re-aggregation — is host-graph-sized. The previous shape derived
    # the mapping's host set from `links` directly, so the href
    # extraction subtree executed TWICE (once under the broadcast build,
    # once under the edge stream); pre-aggregating makes extraction a
    # single pass at any scale (guide §2.4).
    host_pairs = links.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("weight")
    )
    from spdb_spark.session import truncate_lineage

    host_pairs = truncate_lineage(host_pairs, eager=False)
    hosts = (
        host_pairs.select(F.col("src_host").alias("host"))
        .unionByName(host_pairs.select(F.col("dst_host").alias("host")))
        .where(F.col("host") != "")
        .distinct()
    )
    mapping = host_registered_domains(hosts, "host", rules).select(
        "host", F.coalesce("domain", "host").alias("dom")
    )
    e = (
        host_pairs.join(
            F.broadcast(mapping.withColumnRenamed("dom", "src_domain")),
            host_pairs["src_host"] == mapping["host"],
        )
        .drop("host")
        .join(
            F.broadcast(mapping.withColumnRenamed("dom", "dst_domain")),
            host_pairs["dst_host"] == mapping["host"],
        )
        .select("src_domain", "dst_domain", "weight")
    )
    if drop_self:
        e = e.where(F.col("src_domain") != F.col("dst_domain"))
    return e.groupBy("src_domain", "dst_domain").agg(
        F.sum("weight").alias("weight")
    )


def host_graph_edges_sql(
    pages_cte: str,
    url_expr: str = "page_url",
    html_expr: str = "html",
    rules: tuple[str, ...] | None = None,
    drop_self: bool = True,
) -> str:
    """DuckDB SQL computing exactly host_graph_edges over a CTE/table
    `pages_cte` -> (src_domain, dst_domain, weight). Composes the SQL
    twins of every stage (href_targets_sql, url_resolve_sql,
    url_host_sql, registered_domain_sql)."""
    from spdb_spark.functions.domains import (
        DEFAULT_SUFFIX_RULES,
        registered_domain_sql,
    )
    from spdb_spark.functions.html import href_targets_sql
    from spdb_spark.functions.url import url_host_sql, url_resolve_sql

    rd = registered_domain_sql(
        "(SELECT host FROM lg_hosts)", rules=rules or DEFAULT_SUFFIX_RULES
    )
    self_pred = "AND s.dom <> t.dom" if drop_self else ""
    return f"""(
WITH lg_raw AS (
  SELECT {url_expr} AS page_url,
         unnest({href_targets_sql(html_expr)}) AS href
  FROM {pages_cte}
),
lg_links AS (
  SELECT page_url, {url_resolve_sql("page_url", "href")} AS link_url
  FROM lg_raw
),
lg_pairs AS (
  SELECT {url_host_sql("page_url")} AS src_host,
         {url_host_sql("link_url")} AS dst_host
  FROM lg_links
  WHERE regexp_matches(link_url, '^(?i)https?://')
    AND {url_host_sql("link_url")} <> ''
),
lg_hosts AS (
  SELECT DISTINCT host FROM (
    SELECT src_host AS host FROM lg_pairs
    UNION ALL SELECT dst_host FROM lg_pairs
  ) WHERE host <> ''
),
lg_map AS (
  SELECT host, coalesce(domain, host) AS dom FROM {rd}
)
SELECT s.dom AS src_domain, t.dom AS dst_domain,
       COUNT(*)::BIGINT AS weight
FROM lg_pairs p
JOIN lg_map s ON p.src_host = s.host
JOIN lg_map t ON p.dst_host = t.host
WHERE TRUE {self_pred}
GROUP BY 1, 2
)"""
