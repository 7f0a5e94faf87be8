"""Streaming BM25 index maintenance: a foreachBatch sink that grows the
persisted keyword index (functions/retrieval.py layout) one micro-batch
at a time — O(batch) work per batch, the indexed corpus never re-read
(the same incremental posture as StreamingNearDup's band index and the
reference's per-write id-index updates, object_indices.py:730-769).

Exactly-once comes from `append_to_bm25_index`'s staged atomic-rename
protocol keyed by the batch id: Structured Streaming redelivers a failed
batch with the SAME batch_id, and a redelivered append either finds its
commit marker (no-op) or republishes from its sealed staging — never
double-counting postings and never recomputing against a half-appended
base. Queries (`bm25_search_indexed`) resolve df/stats through the
atomic `_current.json` pointer, so a reader mid-append sees a complete
(at worst one-batch-stale) index, never a torn one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from spdb_spark.functions.retrieval import (
    append_to_bm25_index,
    bm25_search_indexed,
    save_bm25_index,
)


class StreamingBM25Index:
    """foreachBatch sink maintaining a persisted BM25 index.

    Usage:
        sink = StreamingBM25Index(spark, path)
        stream.writeStream.foreachBatch(sink.foreach_batch()).start()
        ...
        sink.search(("scan", "merge"))    # query any time
    """

    def __init__(
        self,
        spark,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        id_type: str = "long",
    ):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.text_col = text_col
        # Initialize an EMPTY index if absent so every batch (including 0)
        # goes through the idempotent append path. The empty save is
        # deterministic, so redoing it after a crash converges.
        if not os.path.exists(os.path.join(path, "tf", "_SUCCESS")):
            empty = spark.createDataFrame(
                [], f"{id_col} {id_type}, {text_col} string"
            )
            save_bm25_index(empty, id_col, text_col, path)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        append_to_bm25_index(
            batch_df,
            self.id_col,
            self.text_col,
            self.path,
            batch_id=f"s{batch_id}",
        )

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

    def search(self, terms, k1: float = 1.2, b: float = 0.75) -> DataFrame:
        return bm25_search_indexed(self.spark, self.path, terms, k1=k1, b=b)
