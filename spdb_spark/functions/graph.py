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

# --- HyperBall (Boldi & Vigna 2013) -----------------------------------------
#
# Common Crawl's harmonic host ranks are computed with exactly this
# algorithm: per node an HLL counter of its in-ball B_t(v) = {u :
# d(u, v) <= t}, grown by register-wise MAX along edges (src counter
# flows to dst — the transposed-graph ball), with the neighbourhood
# function estimated per round and harmonic centrality accumulated as
# sum_t (|B_t| - |B_{t-1}|) / t.
#
# Engine-portable protocol: register index j = md5_long('reg:'||v) % m;
# rank rho = trailing-zeros(md5_long('rho:'||v) % 2^50) + 1 computed as
# bit_count((h & -h) - 1) + 1 — pure integer, no log2 float risk.
# Register state is (node, j, rho) rows (<= m per node) and the
# per-node HLL sum scales to integers (2^(51-rho) summed in BIGINT), so
# every aggregate is order-independent; the only float is the final
# per-node scalar estimator (alpha * m^2 * 2^51 / Z, linear-counting
# small-range correction), deterministic arithmetic on exact integers.
# Ball estimates may wobble down when the correction switches branches,
# so increments clamp at 0 (the standard HyperBall practice).

_HB_W = 50  # rank-source width; rho <= 51, 2^(51-rho) fits BIGINT


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hyperball(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    p: int = 4,
    iterations: int = 5,
    materialize: bool = True,
) -> DataFrame:
    """HyperBall harmonic centrality -> (node, reach, harmonic):
    `reach` = estimated |B_T(v)| (how many nodes reach v within T
    hops), `harmonic` = sum_t (|B_t|-|B_{t-1}|)/t — both floored at
    1e-6 for cross-engine stability. m = 2^p registers per node; state
    is m rows/node, per-iteration work one join + one max-groupBy (the
    PageRank shuffle shape), lineage truncated per iteration."""
    if not 2 <= p <= 12:
        raise ValueError(f"p must be in [2, 12], got {p}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    from spdb_spark.functions.hashing import md5_long

    m = 1 << p
    alpha = _hll_alpha(m)
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).distinct()
    nodes = (
        e.select(F.col("_src").alias("node"))
        .unionByName(e.select(F.col("_dst").alias("node")))
        .distinct()
    )
    if materialize:
        from spdb_spark.session import truncate_lineage

        e = truncate_lineage(e, eager=False)
        nodes = truncate_lineage(nodes, eager=False)

    node_s = F.col("node").cast("string")
    h = md5_long(F.concat(F.lit("rho:"), node_s)) % (1 << _HB_W)
    rho = F.when(h == 0, F.lit(_HB_W + 1)).otherwise(
        F.bit_count(h.bitwiseAND(-h) - 1) + 1
    )
    regs = nodes.select(
        "node",
        (md5_long(F.concat(F.lit("reg:"), node_s)) % m).alias("j"),
        rho.cast("int").alias("rho"),
    )

    def estimate(r: DataFrame, colname: str) -> DataFrame:
        per = r.groupBy("node").agg(
            F.count("*").alias("_nnz"),
            F.sum(
                F.expr(f"shiftleft(cast(1 as bigint), cast({_HB_W + 1} - rho as int))")
            ).alias("_zp"),
        )
        z = (
            (m - F.col("_nnz")) * F.lit(1 << (_HB_W + 1)).cast("long")
            + F.col("_zp")
        )
        e_raw = F.lit(alpha * m * m) * F.lit(float(1 << (_HB_W + 1))) / z
        v_zero = m - F.col("_nnz")
        est = F.when(
            (v_zero > 0) & (e_raw <= 2.5 * m),
            F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
        ).otherwise(e_raw)
        return nodes.join(per, "node").select("node", est.alias(colname))

    acc = estimate(regs, "_prev").withColumn("_harm", F.lit(0.0))
    for t in range(1, iterations + 1):
        prop = (
            e.join(regs, e["_src"] == regs["node"])
            .select(F.col("_dst").alias("node"), "j", "rho")
        )
        regs = (
            regs.unionByName(prop)
            .groupBy("node", "j")
            .agg(F.max("rho").alias("rho"))
        )
        if materialize:
            from spdb_spark.session import truncate_lineage

            regs = truncate_lineage(regs, eager=False)
        acc = (
            acc.join(estimate(regs, "_est"), "node")
            .select(
                "node",
                (
                    F.col("_harm")
                    + F.greatest(F.col("_est") - F.col("_prev"), F.lit(0.0))
                    / t
                ).alias("_harm"),
                F.col("_est").alias("_prev"),
            )
        )
        if materialize:
            from spdb_spark.session import truncate_lineage

            acc = truncate_lineage(acc, eager=False)
    return acc.select(
        "node",
        (F.floor(F.col("_prev") * 1e6) / 1e6).alias("reach"),
        (F.floor(F.col("_harm") * 1e6) / 1e6).alias("harmonic"),
    )


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
    # Out-degree and teleport mass are iteration-INVARIANT: join the
    # degree onto the edge frame once and checkpoint both, instead of
    # re-running the edge-sized degree aggregation + join and the
    # node-sized teleport projection inside every iteration's plan
    # (each iteration's checkpoint otherwise replays them — one extra
    # pass over every edge per iteration, at any scale).
    outdeg = ew.groupBy("_src").agg(F.sum("_w").alias("_outdeg"))
    ew = ew.join(outdeg, "_src")
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
    if materialize:
        from spdb_spark.session import truncate_lineage

        ew = truncate_lineage(ew, eager=False)
        teleport = truncate_lineage(teleport, eager=False)
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew["_src"] == ranks["node"])
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


def pagerank_sql(
    edges_cte: str, iterations: int = 5, scale: int = SCALE
) -> str:
    """DuckDB replay of pagerank(): a parenthesized subquery -> (node,
    rank_q) given a CTE/table `edges_cte` with columns (src, dst, w) —
    w already summed per (src, dst), as host_graph_edges_sql emits.
    The integer micro-unit protocol makes each unrolled iteration
    bit-exact against the Spark recurrence (the llm_host_pagerank gate
    pins the same algebra); this helper exists so composed oracles
    (e.g. the ranked crawl gate) reuse it instead of re-deriving the
    unroll."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    prev = "pr_r0"
    its = []
    for k in range(1, iterations + 1):
        its.append(
            f"""pr_it{k} AS (
  SELECT n.node,
         CAST((SELECT t FROM pr_tele)
              + (85 * COALESCE(s.sm, 0)) // 100 AS BIGINT) AS rq
  FROM pr_nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((r.rq * e.w) // o.od) AS sm
    FROM {edges_cte} e JOIN {prev} r ON e.src = r.node
    JOIN pr_outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s USING (node)
)"""
        )
        prev = f"pr_it{k}"
    iters_sql = ",\n".join(its)
    return f"""(
WITH pr_nodes AS (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM {edges_cte}
    UNION ALL SELECT dst FROM {edges_cte}
  )
),
pr_nn AS (SELECT COUNT(*) AS nn FROM pr_nodes),
pr_outdeg AS (
  SELECT src, CAST(SUM(w) AS BIGINT) AS od FROM {edges_cte} GROUP BY src
),
pr_r0 AS (
  SELECT node, CAST({scale} // (SELECT nn FROM pr_nn) AS BIGINT) AS rq
  FROM pr_nodes
),
pr_tele AS (
  SELECT CAST({15 * scale} // (100 * (SELECT nn FROM pr_nn)) AS BIGINT) AS t
),
{iters_sql}
SELECT node, rq AS rank_q FROM pr_it{iterations}
)"""
