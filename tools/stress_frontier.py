"""Frontier-family stress: measured scale behavior for the r14
operators, beyond the 23-host gate fixtures.

- sitemap tree: N_HOSTS hosts x (1 root index -> 2 nested indexes ->
  4 urlsets x URLS_PER_SET urls) — measures the bounded-depth
  broadcast-join expansion at a realistic sitemap-document count.
- recrawl scoring: the full expanded URL set through recrawl_priority
  (pure projection — should scale linearly and stay exchange-free).
- budget apportionment: N_HOSTS-row weight table through
  fetch_budget_allocate; checks sum == budget exactly at scale.

Run: python tools/stress_frontier.py [n_hosts] [urls_per_set]
(defaults 2000 hosts x 4 sets x 25 urls = 200k URLs, 14k sitemap docs)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    per_set = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from pyspark.sql import functions as F

    from spdb_spark.session import get_spark
    from spdb_spark.sources.frontier import (
        fetch_budget_allocate,
        frontier_schedule,
        recrawl_priority,
        sitemap_tree_urls,
    )

    spark = get_spark("stress_frontier")
    spark.sparkContext.setLogLevel("ERROR")

    h = F.col("id")
    host = F.concat(F.lit("h"), h.cast("string"), F.lit(".example"))
    base = F.concat(F.lit("http://"), host, F.lit("/"))
    hosts = spark.range(n_hosts).select(host.alias("host"), base.alias("b"))

    # urlsets s0..s3 per host, each with per_set <url> entries
    u = spark.range(per_set)
    urlset = (
        hosts.crossJoin(spark.range(4).select(F.col("id").alias("s")))
        .crossJoin(u.select(F.col("id").alias("i")))
        .groupBy("host", "b", "s")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(
                    F.collect_list(
                        F.concat(
                            F.lit("<url><loc>"), F.col("b"), F.lit("p"),
                            F.col("s").cast("string"), F.lit("_"),
                            F.col("i").cast("string"),
                            F.lit("</loc><lastmod>2026-0"),
                            (F.col("i") % 6 + 1).cast("string"),
                            F.lit("-11</lastmod><changefreq>"),
                            F.element_at(
                                F.array(
                                    F.lit("daily"), F.lit("weekly"),
                                    F.lit("monthly"),
                                ),
                                (F.col("i") % 3 + 1).cast("int"),
                            ),
                            F.lit("</changefreq></url>"),
                        )
                    ),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("xml")
        )
        .select(
            F.concat(
                F.col("b"), F.lit("sm"), F.col("s").cast("string"),
                F.lit(".xml"),
            ).alias("loc"),
            "xml",
        )
    )
    # two mid indexes (-> 2 urlsets each), one root (-> the 2 indexes)
    mid = (
        hosts.crossJoin(spark.range(2).select(F.col("id").alias("m")))
        .select(
            F.concat(
                F.col("b"), F.lit("idx"), F.col("m").cast("string"),
                F.lit(".xml"),
            ).alias("loc"),
            F.concat(
                F.lit("<sitemapindex><sitemap><loc>"), F.col("b"),
                F.lit("sm"), (F.col("m") * 2).cast("string"),
                F.lit(".xml</loc></sitemap><sitemap><loc>"), F.col("b"),
                F.lit("sm"), (F.col("m") * 2 + 1).cast("string"),
                F.lit(".xml</loc></sitemap></sitemapindex>"),
            ).alias("xml"),
        )
    )
    root = hosts.select(
        F.concat(F.col("b"), F.lit("root.xml")).alias("loc"),
        F.concat(
            F.lit("<sitemapindex><sitemap><loc>"), F.col("b"),
            F.lit("idx0.xml</loc></sitemap><sitemap><loc>"), F.col("b"),
            F.lit("idx1.xml</loc></sitemap></sitemapindex>"),
        ).alias("xml"),
    )
    fetched = urlset.unionByName(mid).unionByName(root)
    fetched.persist().count()  # materialize the fixture outside timing
    roots = hosts.select(
        "host", F.concat(F.col("b"), F.lit("root.xml")).alias("loc")
    )

    t0 = time.perf_counter()
    tree = sitemap_tree_urls(roots, fetched)
    n_urls = tree.count()
    t_tree = time.perf_counter() - t0
    expect = n_hosts * 4 * per_set
    print(
        f"sitemap_tree_urls: {n_urls} urls from "
        f"{n_hosts * 7} sitemap docs in {t_tree:.2f}s "
        f"(expected {expect}: {'OK' if n_urls == expect else 'MISMATCH'})"
    )

    tree.persist().count()
    t0 = time.perf_counter()
    scored = recrawl_priority(tree, 1772323200)
    n_due = scored.where("due").count()
    t_score = time.perf_counter() - t0
    print(
        f"recrawl_priority: scored {n_urls} urls in {t_score:.2f}s "
        f"({n_due} due)"
    )

    t0 = time.perf_counter()
    sched = frontier_schedule(
        scored.where("due"), url_col="loc", default_delay_s=1.0
    )
    n_sched = sched.count()
    t_sched = time.perf_counter() - t0
    print(f"frontier_schedule: {n_sched} slots in {t_sched:.2f}s")

    weights = spark.range(n_hosts * 500).select(
        F.concat(F.lit("w"), F.col("id").cast("string")).alias("host"),
        ((F.col("id") % 997) + (F.col("id") % 7) / 10.0).alias("weight"),
    )
    budget = 10_000_000
    t0 = time.perf_counter()
    alloc = fetch_budget_allocate(weights, budget)
    total = alloc.agg(F.sum("fetch_budget")).first()[0]
    t_alloc = time.perf_counter() - t0
    print(
        f"fetch_budget_allocate: {n_hosts * 500} hosts in {t_alloc:.2f}s "
        f"(sum {total} == {budget}: "
        f"{'OK' if total == budget else 'MISMATCH'})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
