"""Distributed PageRank over a weighted link graph — the crawl-
prioritization / quality-prior op: Common Crawl publishes host-level
link ranks and curation pipelines use them as a per-host quality prior
(alongside the eTLD+1 machinery in functions/domains.py).

Integer micro-unit protocol (the repo's cross-engine discipline): ranks
live in BIGINT micro-units (`scale`, default 1e9) and every step is
integer arithmetic —

    rank_0[n]   = scale // N
    contrib(e)  = (rank[src] * w(e)) // outdeg_w(src)     (floor div)
    rank_t+1[n] = (15 * scale) // (100 * N)
                  + (85 * sum(contrib into n)) // 100

so per-node sums are order-independent across partitions and engines,
and a DuckDB twin replays the unrolled iterations bit-for-bit. The
floor divisions bleed at most a few micro-units per step vs the float
recurrence — quantization noise (~1e-9), far below anything a ranking
consumer can observe; in exchange the result is deterministic on any
cluster. Damping fixed at the standard 0.85 as the 85/100 integer pair.

Scale shape: one join + one map-side-combined groupBy per iteration,
shuffling on node ids (the standard distributed-PageRank topology);
lineage is checkpoint-truncated per iteration (session.truncate_lineage
— the BPE / connected-components posture) so T iterations cost T
bounded plans, not one exponentially nested one. Nodes with no inbound
edges keep the teleport mass via a LEFT join from the node table.
Dangling nodes (no outbound) simply contribute nothing — their mass
exits through the teleport term, the conventional simplification.

Reference-capability analogue: none — north-star crawl surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**9


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 5,
    scale: int = SCALE,
    materialize: bool = True,
) -> DataFrame:
    """Weighted-edge PageRank -> (node, rank_q, rank). `rank_q` is the
    exact BIGINT micro-unit value (gate currency); `rank` = rank_q /
    scale for human consumption. Multi-edges are pre-summed; `weight`
    names an optional edge-weight column (default: each row weighs 1).
    rank_q * max summed edge weight must fit int64 — with the 1e9
    default scale that allows per-edge weights to ~9e9; pre-bucket
    heavier multigraphs or lower `scale`."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
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
    if materialize:
        from spdb_spark.session import truncate_lineage

        ew = truncate_lineage(ew, eager=False)
        nodes = truncate_lineage(nodes, eager=False)
    outdeg = ew.groupBy("_src").agg(F.sum("_w").alias("_outdeg"))
    n_nodes = nodes.agg(F.count("*").alias("_n"))

    # integer div throughout — a float division here could round up
    # across an integer boundary and diverge from the oracle's floor
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "node",
        F.expr(f"cast({scale} as bigint) div _n").alias("rank_q"),
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
        ranks = (
            teleport.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.col("_tele")
                    + F.expr(
                        "(85 * coalesce(_sum, cast(0 as bigint))) div 100"
                    )
                ).alias("rank_q"),
            )
        )
        if materialize:
            from spdb_spark.session import truncate_lineage

            ranks = truncate_lineage(ranks, eager=False)
    return ranks.select(
        "node", "rank_q", (F.col("rank_q") / scale).alias("rank")
    )
