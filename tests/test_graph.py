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


# --- HyperBall ---------------------------------------------------------


def _md5_60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[0:15], 16)


def _ref_hyperball(edges, p=4, iterations=5, W=50):
    import math

    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})

    def jrho(v):
        j = _md5_60(f"reg:{v}") % m
        h = _md5_60(f"rho:{v}") % (1 << W)
        if h == 0:
            return j, W + 1
        return j, bin((h & -h) - 1).count("1") + 1

    regs = {v: {jrho(v)[0]: jrho(v)[1]} for v in nodes}

    def est(r):
        nnz = len(r)
        zp = sum(1 << (W + 1 - rho) for rho in r.values())
        z = (m - nnz) * (1 << (W + 1)) + zp
        e_raw = alpha * m * m * float(1 << (W + 1)) / z
        v0 = m - nnz
        if v0 > 0 and e_raw <= 2.5 * m:
            return m * math.log(m / v0)
        return e_raw

    prev = {v: est(regs[v]) for v in nodes}
    harm = {v: 0.0 for v in nodes}
    for t in range(1, iterations + 1):
        new = {v: dict(regs[v]) for v in nodes}
        for s, d in edges:
            for j, rho in regs[s].items():
                if new[d].get(j, 0) < rho:
                    new[d][j] = rho
        regs = new
        for v in nodes:
            e_t = est(regs[v])
            harm[v] += max(e_t - prev[v], 0.0) / t
            prev[v] = e_t
    import math as _m

    return {
        v: (_m.floor(prev[v] * 1e6) / 1e6, _m.floor(harm[v] * 1e6) / 1e6)
        for v in nodes
    }


HB_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),  # line: distances 1-4
    ("x", "e"), ("y", "e"), ("z", "x"),              # extra in-tree to e
]


def test_hyperball_matches_reference_exactly(spark):
    from spdb_spark.functions.graph import hyperball

    df = spark.createDataFrame(HB_EDGES, "src string, dst string")
    got = {
        r.node: (r.reach, r.harmonic)
        for r in hyperball(df, iterations=5).collect()
    }
    assert got == _ref_hyperball(HB_EDGES, iterations=5)


def test_hyperball_reach_monotone_and_sink_dominates(spark):
    from spdb_spark.functions.graph import hyperball

    df = spark.createDataFrame(HB_EDGES, "src string, dst string")
    r3 = {r.node: r.reach for r in hyperball(df, iterations=3).collect()}
    r5 = {r.node: r.reach for r in hyperball(df, iterations=5).collect()}
    assert all(r5[v] >= r3[v] for v in r3)  # registers only grow
    # 'e' is reachable from every other node; 'a'/'z' from none
    assert max(r5, key=r5.get) == "e"
    assert r5["a"] == min(r5.values())


def test_hyperball_rho_protocol():
    # bit_count((h & -h) - 1) + 1 == trailing zeros + 1, the HLL rho
    for h, want in [(1, 1), (2, 2), (4, 3), (12, 3), (1 << 49, 50), (5, 1)]:
        assert bin((h & -h) - 1).count("1") + 1 == want


def test_hyperball_validation(spark, edges_df):
    from spdb_spark.functions.graph import hyperball

    with pytest.raises(ValueError):
        hyperball(edges_df, p=1)
    with pytest.raises(ValueError):
        hyperball(edges_df, iterations=0)


def test_plan_shape(spark, edges_df):
    plan = (
        pagerank(edges_df, weight="w", iterations=2, materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
