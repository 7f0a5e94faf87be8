"""PageRank stress: 100k-node / ~1M-edge md5-derived host graph on
local[32] — measures per-iteration wall and pins that the integer
protocol converges (top ranks stabilize between 5 and 10 iterations).
Run: python tools/stress_graph.py [n_nodes] [edges_per_node]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spdb_spark.functions.graph import pagerank  # noqa: E402
from spdb_spark.functions.hashing import md5_long  # noqa: E402
from spdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("stress-graph", shuffle_partitions=32)

    targets = [
        (
            md5_long(
                F.concat_ws(":", F.col("id").cast("string"), F.lit(str(i)))
            )
            % n_nodes
        ).alias(f"t{i}")
        for i in range(k)
    ]
    edges = (
        spark.range(n_nodes)
        .select(F.col("id").alias("src"), F.explode(F.array(*targets)).alias("dst"))
    )
    edges.write.mode("overwrite").parquet("/tmp/stress_graph_edges")
    edges = spark.read.parquet("/tmp/stress_graph_edges")

    for iters in (5, 10):
        t0 = time.time()
        pr = pagerank(edges, "src", "dst", iterations=iters)
        top = pr.orderBy(F.col("rank_q").desc(), "node").limit(10).collect()
        t1 = time.time()
        print(
            f"pagerank {n_nodes} nodes x {k} out-links, {iters} iters: "
            f"{t1-t0:.1f}s ({(t1-t0)/iters:.1f}s/iter); "
            f"top3 {[(r.node, r.rank_q) for r in top[:3]]}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
