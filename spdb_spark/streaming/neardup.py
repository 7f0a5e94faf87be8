"""Streaming near-duplicate detection: each micro-batch of documents is
checked against everything ingested before it (and against itself), and
the corpus band index grows incrementally.

Composition of existing pieces, not new math: per batch,
`minhash_lsh_dedup` finds in-batch pairs, `incremental_minhash_dedup`
probes the persisted band index for cross-batch pairs (verifying exact
Jaccard only against the candidate corpus docs), and the batch's own
`band_buckets` rows are appended to the index. The expensive invariant
— the corpus is NEVER re-paired with itself — holds: per micro-batch
work is O(batch x matching buckets), not O(corpus^2).

Exactly-once: every table is laid out as per-batch subdirectories plus
an atomic-rename ledger (the `TransactionalVoxelIngest` pattern,
streaming/ingest.py). A batch's writes all land under `*/b{batch_id}`
in overwrite mode, and the batch only "exists" once its ledger file is
renamed into place — so a foreachBatch redelivery after a crash either
finds its ledger entry (skip) or overwrites its own partial output and
commits. Readers only consult committed batch dirs.

At 100 TB the band index is a bucketed table (bucket column) so the
probe join co-locates without shuffling the corpus side; on plain
parquet the append-only layout is the same, Spark just shuffles the
(small) batch side. Under Delta/Iceberg the per-batch dirs become ACID
appends and the ledger becomes the txn app-id/version — the interface
is unchanged.

Reference parity: the reference dedups redundant cuboid writes at
ingest via write-buffer key idempotency (spdb/spatialdb/spatialdb.py
write path); this module is the analogous "flag duplicates as data
arrives" workflow for the document/LLM-pipeline tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.streaming.ledger import BatchLedgerSink

from spdb_spark.functions.dedup import (
    band_buckets,
    incremental_minhash_dedup,
    minhash_lsh_dedup,
    minhash_signatures,
    shingles,
)

_PAIR_SCHEMA = "id_a long, id_b long, jaccard double, batch_id long"
_BAND_SCHEMA = "doc long, band int, bucket string"


class StreamingNearDup(BatchLedgerSink):
    """foreachBatch sink flagging near-dup documents as they arrive.

    Under `base_path` (layout + compaction: streaming/ledger.py):
      pairs/b{N}   (id_a, id_b, jaccard, batch_id) flagged in batch N
      bands/b{N}   batch N's slice of the LSH band index
      docs/b{N}    batch N's (id, text) — verification corpus
      _log/N.json  commit marker (atomic rename; last write of batch N)

    Within-batch pairs have id_a < id_b; cross-batch pairs have
    id_a = the earlier (corpus) doc, id_b = the newly arrived doc.
    """

    def __init__(
        self,
        spark,
        base_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k: int = 3,
        num_hashes: int = 16,
        bands: int = 8,
        rows: int = 2,
        threshold: float = 0.2,
    ):
        super().__init__(spark, base_path)
        self.STATE_TABLES = {
            "pairs": _PAIR_SCHEMA,
            "bands": _BAND_SCHEMA,
            "docs": f"{id_col} long, {text_col} string",
        }
        self.id_col = id_col
        self.text_col = text_col
        self.k = k
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows = rows
        self.threshold = threshold

    # -- committed-state readers ------------------------------------------

    def pairs(self) -> DataFrame:
        """All committed near-dup pairs."""
        df = self._read("pairs", _PAIR_SCHEMA, self._committed())
        if df is None:
            return self.spark.createDataFrame([], _PAIR_SCHEMA)
        return df

    # -- the sink ----------------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        committed = self._committed()
        if batch_id in committed:
            return  # foreachBatch redelivery after a crash: already done
        batch = batch.persist()
        try:
            within = minhash_lsh_dedup(
                batch,
                self.id_col,
                self.text_col,
                k=self.k,
                num_hashes=self.num_hashes,
                bands=self.bands,
                rows=self.rows,
                threshold=self.threshold,
                # a micro-batch is bounded by the trigger size, never the
                # corpus — broadcast verify is always legal here; no
                # checkpointing on micro-batches
                verify="broadcast",
                materialize=False,
            ).select("id_a", "id_b", "jaccard")
            idx = self._read("bands", _BAND_SCHEMA, committed)
            if idx is not None:
                corpus = self._read(
                    "docs", f"{self.id_col} long, {self.text_col} string", committed
                )
                cross = incremental_minhash_dedup(
                    batch,
                    corpus_docs=corpus,
                    id_col=self.id_col,
                    text_col=self.text_col,
                    k=self.k,
                    num_hashes=self.num_hashes,
                    bands=self.bands,
                    rows=self.rows,
                    threshold=self.threshold,
                    corpus_bands=idx,
                ).select(
                    F.col("corpus_id").alias("id_a"),
                    F.col("new_id").alias("id_b"),
                    "jaccard",
                )
                within = within.unionByName(cross)
            out = within.withColumn("batch_id", F.lit(batch_id).cast("long"))
            out.write.mode("overwrite").parquet(self._dir("pairs", batch_id))

            sh = shingles(batch, self.id_col, self.text_col, self.k, distinct=False)
            band_buckets(
                minhash_signatures(sh, self.id_col, self.num_hashes),
                self.bands,
                self.rows,
            ).write.mode("overwrite").parquet(self._dir("bands", batch_id))
            batch.select(self.id_col, self.text_col).write.mode("overwrite").parquet(
                self._dir("docs", batch_id)
            )
            self._commit(batch_id)
        finally:
            batch.unpersist()

    def start(self, stream: DataFrame, checkpoint: str, **trigger_kwargs):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )
