"""Scale stress for the outbound-link host graph (functions/linkgraph)
and the rank-prior path: synthetic HTML pages at parametric scale ->
href extraction -> eTLD+1 weighted edges -> integer PageRank.

Usage: python tools/stress_linkgraph.py [n_pages] [links_per_page]
(defaults 200_000 x 6). Prints one JSON line with stage walls; SCALE.md
records the measured numbers.

What the measurement is FOR: extraction is a scan-stage projection, so
pages/sec here bounds the per-core crawl throughput; the edge groupBy
output is graph-sized, so its wall must track hosts, not pages.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_links = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n_hosts = max(n_pages // 10, 100)

    from pyspark.sql import functions as F

    from spdb_spark.functions.linkgraph import host_graph_edges
    from spdb_spark.functions.graph import pagerank
    from spdb_spark.session import get_spark

    spark = get_spark("stress_linkgraph")
    spark.sparkContext.setLogLevel("ERROR")

    anchor = (
        '<a href="http://h{T}.example/p?x=1">t</a>'
        "<a href='//h{T}.example/q'>u</a>"
        "<a href=/self>s</a>"
    )
    link_cols = []
    for j in range(n_links):
        t = F.pmod(F.xxhash64(F.col("id") + j * 7919), F.lit(n_hosts))
        link_cols += [
            F.lit('<a href="http://h'), t.cast("string"),
            F.lit('.example/p">x</a> '),
        ]
    pages = spark.range(n_pages).select(
        F.concat(
            F.lit("http://h"),
            F.pmod(F.xxhash64("id"), F.lit(n_hosts)).cast("string"),
            F.lit(".example/d"),
            F.col("id").cast("string"),
        ).alias("page_url"),
        F.concat(
            F.lit("<html><body><p>some page prose here</p><div>"),
            *link_cols,
            F.lit('<a href="/self">s</a></div></body></html>'),
        ).alias("html"),
    ).localCheckpoint()  # freeze input so stages time compute, not genexpr
    _ = pages.count()

    t0 = time.perf_counter()
    edges = host_graph_edges(pages, "page_url", "html")
    edges.write.format("noop").mode("overwrite").save()
    t_edges = time.perf_counter() - t0

    e2 = edges.localCheckpoint()
    n_edges = e2.count()
    t0 = time.perf_counter()
    pr = pagerank(e2, "src_domain", "dst_domain", weight="weight", iterations=5)
    pr.write.format("noop").mode("overwrite").save()
    t_rank = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "links_per_page": n_links,
                "n_hosts": n_hosts,
                "extract_edges_sec": round(t_edges, 2),
                "pages_per_sec": round(n_pages / t_edges),
                "distinct_edges": n_edges,
                "pagerank5_sec": round(t_rank, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
