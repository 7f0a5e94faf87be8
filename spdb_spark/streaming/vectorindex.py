"""Streaming vector-index maintenance: a foreachBatch sink that grows a
persisted IVF or IVF-PQ index one micro-batch at a time — O(batch) work
per batch, the indexed corpus never re-read or re-encoded (the
StreamingBM25Index posture; reference parity: per-write id-index
updates, object_indices.py:730-769).

The coarse quantizer (and, for IVF-PQ, the residual codebooks) is
FROZEN at index-build time — the standard streaming-ANN contract
(faiss-style deployments train offline, append online): appended
vectors encode against the frozen quantizer, so the streamed index is
bit-identical to a batch rebuild over the union corpus with the same
quantizer (test-pinned), and quantizer drift is a rebuild-time quality
knob, never a correctness one. A stream therefore can't bootstrap an
index from nothing — pass `bootstrap` (a representative corpus; at
100 TB a sample) or build with save_index/save_ivfpq_index first.

Exactly-once comes from `staged_partitioned_append` keyed by the batch
id: Structured Streaming redelivers a failed batch with the SAME
batch_id, and a redelivered append either finds its commit marker
(no-op) or republishes from its sealed staging — never double-appending
code/list rows. After many micro-batches, `compact()` collapses the
per-append files into one file per centroid partition (the OPTIMIZE
analogue) and `vacuum()` reclaims superseded generations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class StreamingVectorIndex:
    """foreachBatch sink maintaining a persisted IVF ("ivf") or IVF-PQ
    ("ivfpq") index.

    Usage:
        sink = StreamingVectorIndex(spark, path, kind="ivfpq",
                                    bootstrap=corpus_sample)
        stream.writeStream.foreachBatch(sink.foreach_batch()).start()
        ...
        sink.topk(queries, corpus)     # query any time
    """

    def __init__(
        self,
        spark,
        path: str,
        kind: str = "ivfpq",
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        dim: int = 64,
        n_centroids: int = 16,
        m: int = 8,
        n_codes: int = 16,
        engine: str = "expr",
        quantize: bool = False,
        bootstrap: DataFrame | None = None,
    ):
        if kind not in ("ivf", "ivfpq"):
            raise ValueError(f"StreamingVectorIndex: unknown kind {kind!r}")
        self.spark = spark
        self.path = path
        self.kind = kind
        self.id_col = id_col
        self.vec_col = vec_col
        self.dim = dim
        self.engine = engine
        if not os.path.exists(os.path.join(path, "centroids", "_SUCCESS")):
            if bootstrap is None:
                raise ValueError(
                    "StreamingVectorIndex: no index at "
                    f"{path} — the quantizer must be trained before "
                    "streaming appends (pass bootstrap= or build with "
                    "save_index/save_ivfpq_index first)"
                )
            if kind == "ivfpq":
                from spdb_spark.functions.pq import save_ivfpq_index

                save_ivfpq_index(
                    bootstrap, path, id_col, vec_col, dim=dim,
                    n_centroids=n_centroids, m=m, n_codes=n_codes,
                    engine=engine,
                )
            else:
                from spdb_spark.functions.ivf import save_index

                save_index(
                    bootstrap, path, id_col, vec_col,
                    n_centroids=n_centroids, quantize=quantize,
                )

    # -- the sink ----------------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.kind == "ivfpq":
            from spdb_spark.functions.pq import append_to_ivfpq_index

            append_to_ivfpq_index(
                self.spark, self.path, batch_df, self.id_col, self.vec_col,
                dim=self.dim, engine=self.engine, batch_id=f"s{batch_id}",
            )
        else:
            from spdb_spark.functions.ivf import append_to_index

            append_to_index(
                self.spark, self.path, batch_df, self.id_col, self.vec_col,
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

    # -- queries + maintenance ----------------------------------------------

    def topk(
        self,
        queries: DataFrame,
        corpus: DataFrame | None = None,
        k: int = 10,
        n_probe: int = 4,
        rerank: int = 30,
    ) -> DataFrame:
        """Top-k through the pruned indexed path. IVF-PQ needs `corpus`
        (primary float storage) for the exact re-rank; IVF scores the
        stored list vectors directly."""
        if self.kind == "ivfpq":
            if corpus is None:
                raise ValueError(
                    "StreamingVectorIndex(kind='ivfpq').topk needs corpus= "
                    "— the float vectors for the exact re-rank live in "
                    "primary storage, not the code index"
                )
            from spdb_spark.functions.pq import ivfpq_topk_indexed

            return ivfpq_topk_indexed(
                self.spark, self.path, queries, corpus, self.id_col,
                self.vec_col, dim=self.dim, k=k, n_probe=n_probe,
                rerank=rerank, engine=self.engine,
            )
        from spdb_spark.functions.ivf import ivf_topk_indexed

        return ivf_topk_indexed(
            self.spark, self.path, queries, self.id_col, self.vec_col,
            k=k, n_probe=n_probe,
        )

    def compact(self) -> None:
        if self.kind == "ivfpq":
            from spdb_spark.functions.pq import compact_ivfpq_index

            compact_ivfpq_index(self.spark, self.path)
        else:
            from spdb_spark.functions.ivf import compact_index

            compact_index(self.spark, self.path)

    def vacuum(self) -> None:
        if self.kind == "ivfpq":
            from spdb_spark.functions.pq import vacuum_ivfpq_index

            vacuum_ivfpq_index(self.path)
        else:
            from spdb_spark.functions.ivf import vacuum_index

            vacuum_index(self.path)
