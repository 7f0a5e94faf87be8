"""Streaming host-graph maintenance — the link graph of a live crawl
accumulated on an unbounded edge feed, with PageRank / HyperBall
harmonic ranks computable at any point over everything seen so far.

Why graph state streams well: the weighted edge list is a pure
SUM-monoid on (src, dst) — per-batch work is ONE map-side-combined
groupBy over the BATCH only (O(batch), never O(history)), and the
accumulated graph is the per-key sum of per-batch slices, which the
ledger layout stores as plain appends. Because a sum is NOT idempotent
(unlike Bloom's bit_or), redelivered batches are made exactly-once by
the ledger marker, the count-min posture.

Rank reads recompute the integer-protocol PageRank / HyperBall
(functions/graph.py) over the accumulated GRAPH-sized state — the
read-time-canonicalization pattern of StreamingCrawlCorpus: stream
ranks equal the batch ranks on the union of all batches for ANY
arrival order, by construction, which is exactly what the shared-
oracle driver gate proves. Warm-starting the iteration from previous
ranks was considered and rejected: the repo's PageRank is an exact
T-iteration protocol (bit-replayable by the oracle), and a warm start
changes the result; a fixed-point variant would trade the driver-
checkable protocol for convergence speed the graph-sized state does
not need.

State: `edges/b{N}` parquet slices of (src, dst, w); total state is
graph-sized (bounded by distinct edges per batch), collapsed lazily at
read time and physically by the inherited compact()/vacuum().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.streaming.ledger import BatchLedgerSink

_EDGES_DDL = "src string, dst string, w long"


class StreamingHostGraph(BatchLedgerSink):
    """foreachBatch sink accumulating a weighted edge list.

    Usage:
        sink = StreamingHostGraph(spark, path)
        q = sink.start(edge_stream, checkpoint)   # (src, dst[, w]) rows
        ...
        sink.pagerank_ranks()                     # (node, rank_q, rank)
        sink.harmonic_ranks()                     # (node, reach, harmonic)
    """

    STATE_TABLES = {"edges": _EDGES_DDL}

    def __init__(
        self,
        spark,
        base_path: str,
        src_col: str = "src",
        dst_col: str = "dst",
        weight_col: str | None = None,
    ):
        super().__init__(spark, base_path)
        self.src_col = src_col
        self.dst_col = dst_col
        self.weight_col = weight_col

    # -- sink ----------------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed():
            return  # redelivered: this batch's edge slice already summed
        w = (
            F.col(self.weight_col).cast("long")
            if self.weight_col
            else F.lit(1).cast("long")
        )
        slice_df = (
            batch_df.select(
                F.col(self.src_col).alias("src"),
                F.col(self.dst_col).alias("dst"),
                w.alias("w"),
            )
            .groupBy("src", "dst")
            .agg(F.sum("w").alias("w"))
        )
        slice_df.write.mode("overwrite").parquet(
            self._dir("edges", batch_id)
        )
        self._commit(batch_id)

    def foreach_batch(self):
        return lambda df, batch_id: self.process_batch(df, batch_id)

    def start(self, stream: DataFrame, checkpoint: str, **trigger_kwargs):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )

    # -- reads ----------------------------------------------------------

    def edges(self) -> DataFrame:
        """The accumulated weighted edge list, one row per (src, dst)."""
        state = self._read_state("edges", _EDGES_DDL)
        if state is None:
            return self.spark.createDataFrame([], _EDGES_DDL)
        return state.groupBy("src", "dst").agg(F.sum("w").alias("w"))

    def pagerank_ranks(self, iterations: int = 5) -> DataFrame:
        """(node, rank_q, rank): the exact T-iteration integer-protocol
        PageRank over everything accumulated — equals the batch run on
        the union of all batches, any arrival order."""
        from spdb_spark.functions.graph import pagerank

        return pagerank(
            self.edges(), "src", "dst", weight="w", iterations=iterations
        )

    def harmonic_ranks(self, p: int = 4, iterations: int = 5) -> DataFrame:
        """(node, reach, harmonic): HyperBall over the accumulated
        graph (edge MULTIPLICITY is irrelevant to reachability —
        hyperball distincts internally)."""
        from spdb_spark.functions.graph import hyperball

        return hyperball(
            self.edges(), "src", "dst", p=p, iterations=iterations
        )
