"""Integer-protocol PageRank: exact equality with an independent Python
replica, mass accounting, authority ordering, validation, plan shape."""

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.graph import SCALE, pagerank

EDGES = [
    # (src, dst, w): a hub everyone cites, a spoke chain, a multi-edge
    # (pre-summed into w=3), a node with no inbound (a), and a dangling
    # sink (z: inbound only).
    ("a", "hub", 1),
    ("b", "hub", 3),
    ("c", "hub", 1),
    ("d", "hub", 2),
    ("hub", "b", 1),
    ("b", "c", 1),
    ("c", "d", 1),
    ("d", "z", 1),
    ("a", "z", 2),
]


def _ref_pagerank(edges, iterations=5, scale=SCALE):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    outdeg = defaultdict(int)
    for s, _, w in edges:
        outdeg[s] += w
    rank = {v: scale // n for v in nodes}
    tele = (15 * scale) // (100 * n)
    for _ in range(iterations):
        sums = defaultdict(int)
        for s, d, w in edges:
            sums[d] += (rank[s] * w) // outdeg[s]
        rank = {v: tele + (85 * sums.get(v, 0)) // 100 for v in nodes}
    return rank


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src string, dst string, w long")


def test_matches_reference_exactly(spark, edges_df):
    got = {
        r.node: r.rank_q
        for r in pagerank(edges_df, weight="w", iterations=5).collect()
    }
    assert got == _ref_pagerank(EDGES, 5)


def test_unweighted_multirow_equals_weighted(spark, edges_df):
    """Repeating an edge row w times == passing weight w (edges are
    pre-summed)."""
    rows = [(s, d) for s, d, w in EDGES for _ in range(w)]
    unweighted = spark.createDataFrame(rows, "src string, dst string")
    a = {r.node: r.rank_q for r in pagerank(unweighted, iterations=3).collect()}
    b = {
        r.node: r.rank_q
        for r in pagerank(edges_df, weight="w", iterations=3).collect()
    }
    assert a == b


def test_hub_ranks_first_and_mass_accounted(spark, edges_df):
    res = pagerank(edges_df, weight="w", iterations=10).collect()
    ranks = {r.node: r.rank_q for r in res}
    assert max(ranks, key=ranks.get) == "hub"
    # total mass stays <= scale (floor divisions and the dangling sink
    # only ever LEAK mass) and within a sane band of it
    total = sum(ranks.values())
    assert total <= SCALE
    assert total > 0.5 * SCALE
    # the no-inbound node holds exactly the teleport floor
    tele = (15 * SCALE) // (100 * len(ranks))
    assert ranks["a"] == tele


def test_rank_column_consistent(spark, edges_df):
    for r in pagerank(edges_df, weight="w", iterations=2).collect():
        assert r.rank == r.rank_q / SCALE


def test_validation(spark, edges_df):
    with pytest.raises(ValueError):
        pagerank(edges_df, iterations=0)


def test_plan_shape(spark, edges_df):
    plan = (
        pagerank(edges_df, weight="w", iterations=2, materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
