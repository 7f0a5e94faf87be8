"""StreamingHostGraph (streaming/graph.py): stream==batch rank
equality under arrival-order permutations, ledger redelivery no-op
(the sum-monoid is NOT idempotent, so the marker is load-bearing),
compaction invariance, and weighted-edge accumulation."""

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.graph import hyperball, pagerank
from spdb_spark.streaming.graph import StreamingHostGraph

EDGES = [
    ("a.com", "hub.com"),
    ("b.com", "hub.com"),
    ("c.com", "hub.com"),
    ("hub.com", "a.com"),
    ("a.com", "b.com"),
    ("a.com", "hub.com"),  # duplicate edge -> weight 2
    ("b.com", "c.com"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _ranks(df):
    return {r.node: r.rank_q for r in df.collect()}


@pytest.mark.parametrize("order", [(0, 1, 2), (2, 0, 1)])
def test_stream_equals_batch_any_order(spark, tmp_path, order):
    sink = StreamingHostGraph(spark, str(tmp_path / f"s{order[0]}{order[1]}"))
    chunks = [EDGES[:3], EDGES[3:5], EDGES[5:]]
    for bid, idx in enumerate(order):
        sink.process_batch(_df(spark, chunks[idx]), bid)
    got = _ranks(sink.pagerank_ranks(iterations=3))
    want = _ranks(
        pagerank(_df(spark, EDGES), "src", "dst", iterations=3)
    )
    assert got == want


def test_redelivery_is_noop(spark, tmp_path):
    """The weight fold is a SUM — re-processing a delivered batch would
    double-count without the ledger marker."""
    sink = StreamingHostGraph(spark, str(tmp_path / "redeliver"))
    sink.process_batch(_df(spark, EDGES[:4]), 0)
    sink.process_batch(_df(spark, EDGES[4:]), 1)
    before = sorted(
        (r.src, r.dst, r.w) for r in sink.edges().collect()
    )
    sink.process_batch(_df(spark, EDGES[:4]), 0)  # redelivered
    after = sorted((r.src, r.dst, r.w) for r in sink.edges().collect())
    assert before == after
    got = {(r.src, r.dst): r.w for r in sink.edges().collect()}
    assert got[("a.com", "hub.com")] == 2  # real duplicate kept once each


def test_compact_preserves_ranks(spark, tmp_path):
    sink = StreamingHostGraph(spark, str(tmp_path / "compact"))
    for bid, chunk in enumerate([EDGES[:3], EDGES[3:5], EDGES[5:]]):
        sink.process_batch(_df(spark, chunk), bid)
    before = _ranks(sink.pagerank_ranks(iterations=2))
    sink.compact()
    sink.vacuum()
    assert _ranks(sink.pagerank_ranks(iterations=2)) == before


def test_harmonic_stream_equals_batch(spark, tmp_path):
    sink = StreamingHostGraph(spark, str(tmp_path / "harm"))
    for bid, chunk in enumerate([EDGES[:2], EDGES[2:]]):
        sink.process_batch(_df(spark, chunk), bid)
    got = sorted(
        (r.node, r.reach, r.harmonic)
        for r in sink.harmonic_ranks(p=4, iterations=3).collect()
    )
    want = sorted(
        (r.node, r.reach, r.harmonic)
        for r in hyperball(
            _df(spark, EDGES), "src", "dst", p=4, iterations=3
        ).collect()
    )
    assert got == want


def test_weighted_input_column(spark, tmp_path):
    sink = StreamingHostGraph(
        spark, str(tmp_path / "wtd"), weight_col="n"
    )
    df = spark.createDataFrame(
        [("a.com", "hub.com", 3), ("hub.com", "a.com", 1)],
        "src string, dst string, n long",
    )
    sink.process_batch(df, 0)
    sink.process_batch(df, 1)  # distinct batch id: sums to 6 / 2
    got = {(r.src, r.dst): r.w for r in sink.edges().collect()}
    assert got == {("a.com", "hub.com"): 6, ("hub.com", "a.com"): 2}
