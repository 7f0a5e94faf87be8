"""Interleaved A/B: pagerank with iteration-invariant outdeg/teleport
hoisted + checkpointed (new) vs re-derived per iteration (old form
inlined). Runs the llm_host_pagerank gate's edge fixture at sf0.1.

Usage: python tools/ab_r14d.py [sf_dir] [passes]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SCALE = 10**9


def pagerank_old(edges, src="src", dst="dst", weight=None, iterations=5,
                 scale=SCALE):
    from spdb_spark.session import truncate_lineage

    w = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    ew = (
        edges.select(
            F.col(src).alias("_src"), F.col(dst).alias("_dst"), w.alias("_w")
        )
        .groupBy("_src", "_dst")
        .agg(F.sum("_w").alias("_w"))
    )
    nodes = (
        ew.select(F.col("_src").alias("node"))
        .unionByName(ew.select(F.col("_dst").alias("node")))
        .distinct()
    )
    ew = truncate_lineage(ew, eager=False)
    nodes = truncate_lineage(nodes, eager=False)
    outdeg = ew.groupBy("_src").agg(F.sum("_w").alias("_outdeg"))
    n_nodes = nodes.agg(F.count("*").alias("_n"))
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node", F.expr(f"cast({scale} as bigint) div _n").alias("rank_q")
    )
    teleport = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node",
        F.expr(f"cast({15 * scale} as bigint) div (100 * _n)").alias("_tele"),
    )
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew["_src"] == ranks["node"])
            .join(outdeg, "_src")
            .select(
                F.col("_dst").alias("node"),
                F.expr("(rank_q * _w) div _outdeg").alias("_c"),
            )
            .groupBy("node")
            .agg(F.sum("_c").alias("_sum"))
        )
        ranks = teleport.join(contrib, "node", "left").select(
            "node",
            (
                F.col("_tele")
                + F.expr("(85 * coalesce(_sum, cast(0 as bigint))) div 100")
            ).alias("rank_q"),
        )
        ranks = truncate_lineage(ranks, eager=False)
    return ranks.select(
        "node", "rank_q", (F.col("rank_q") / scale).alias("rank")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from spdb_spark.functions import graph as G
    from spdb_spark.session import get_spark
    from spdb_spark.suite_llm import q_host_pagerank

    spark = get_spark("ab_r14d")
    spark.sparkContext.setLogLevel("ERROR")
    pagerank_new = G.pagerank

    def run(form) -> float:
        # the gate imports pagerank at call time, so patching the module
        # attribute switches the physical form without touching the gate
        G.pagerank = form
        try:
            t0 = time.perf_counter()
            q_host_pagerank(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.perf_counter() - t0
        finally:
            G.pagerank = pagerank_new

    def old_form(edges, src="src", dst="dst", weight=None, iterations=5,
                 scale=SCALE, materialize=True):
        return pagerank_old(edges, src, dst, weight, iterations, scale)

    run(pagerank_new)
    run(old_form)
    tn, to, ratios = [], [], []
    for _ in range(passes):
        a = run(pagerank_new)
        b = run(old_form)
        tn.append(a)
        to.append(b)
        ratios.append(a / b)
    print(
        f"pagerank: new={[round(x, 2) for x in tn]} "
        f"old={[round(x, 2) for x in to]} "
        f"median_ratio={statistics.median(ratios):.3f} "
        f"(new_med={statistics.median(tn):.2f}s "
        f"old_med={statistics.median(to):.2f}s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
