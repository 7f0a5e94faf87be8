"""Interleaved A/B: sitemap_tree_urls with vs without the one-time
fetch-table lineage truncation (the per-depth broadcast join otherwise
replays the fetch table's full lineage once per depth).

Usage: python tools/ab_r14c.py [sf_dir] [passes]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def tree_old(roots, fetched, max_depth=3):
    # the pre-change loop: fetch table joined raw each depth
    from spdb_spark.session import truncate_lineage
    from spdb_spark.sources.frontier import sitemap_index_locs, sitemap_urls

    keep_cols = ("host",)
    frontier = roots.select(*keep_cols, F.col("loc").alias("_sm_loc")).distinct()
    seen = frontier.select(*keep_cols, "_sm_loc")
    docs = fetched.select(
        F.col("loc").alias("_sm_loc"), F.col("xml").alias("_sm_xml")
    )
    leaves = None
    for depth in range(max_depth):
        cur = truncate_lineage(
            docs.join(F.broadcast(frontier), "_sm_loc").select(
                *keep_cols, F.col("_sm_xml").alias("_sm_doc")
            ),
            eager=False,
        )
        urls = sitemap_urls(cur, xml_col="_sm_doc", keep_cols=keep_cols)
        leaves = urls if leaves is None else leaves.unionByName(urls)
        if depth == max_depth - 1:
            break
        children = (
            sitemap_index_locs(cur, xml_col="_sm_doc", keep_cols=keep_cols)
            .select(*keep_cols, F.col("loc").alias("_sm_loc"))
            .distinct()
            .join(seen, [*keep_cols, "_sm_loc"], "left_anti")
        )
        frontier = truncate_lineage(children)
        if not frontier.take(1):
            break
        seen = seen.unionByName(frontier)
    return leaves


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from spdb_spark.session import get_spark
    from spdb_spark.sources.frontier import sitemap_tree_urls
    from spdb_spark.suite_crawl import _sitemap_tree_fixture

    spark = get_spark("ab_r14c")
    spark.sparkContext.setLogLevel("ERROR")

    def run(builder) -> float:
        t0 = time.perf_counter()
        roots, fetched = _sitemap_tree_fixture(spark, sf_dir)
        builder(roots, fetched).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    new = lambda r, f: sitemap_tree_urls(r, f)  # noqa: E731
    run(new)
    run(tree_old)
    tn, to, ratios = [], [], []
    for _ in range(passes):
        a = run(new)
        b = run(tree_old)
        tn.append(a)
        to.append(b)
        ratios.append(a / b)
    print(
        f"sitemap_tree: new={[round(x, 2) for x in tn]} "
        f"old={[round(x, 2) for x in to]} "
        f"median_ratio={statistics.median(ratios):.3f} "
        f"(new_med={statistics.median(tn):.2f}s "
        f"old_med={statistics.median(to):.2f}s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
