"""Streaming paragraph-level dedup: each micro-batch's documents are
cleaned of paragraphs already seen — in the batch itself (canonical first
occurrence kept) or in ANY earlier batch (the canonical copy already
shipped) — and the corpus paragraph-hash index grows incrementally.

Composition of the batch operators (functions/dedup.py): per batch,
`paragraph_dedup` removes within-batch duplicates, an anti-join against
the persisted hash index removes cross-batch ones, and
`reassemble_paragraph_docs` rebuilds cleaned documents. The scale
invariant matches StreamingNearDup: the corpus is never re-scanned — per
micro-batch work is O(batch paragraphs + matching index rows), the index
probe being an equi-join on the md5 paragraph hash (uniform keys;
bucketed table co-locates it at 100 TB).

Exactly-once uses the same per-batch-dirs + atomic-rename-ledger layout
as StreamingNearDup (see streaming/neardup.py): a redelivered batch
either finds its ledger entry (skip) or overwrites its own partial
output; readers only consult committed batch dirs.

Reference parity: n/a (spdb has no document pipeline) — this is the
streaming face of the CCNet/RefinedWeb-style boilerplate removal the
batch suite gates as `llm_paragraph_dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.streaming.ledger import BatchLedgerSink

from spdb_spark.functions.dedup import (
    paragraph_dedup,
    paragraphs,
    reassemble_paragraph_docs,
    word_chunk_paragraphs,
)

_DOC_SCHEMA = "doc long, clean_text string, n_paras bigint, n_kept long"
_PH_SCHEMA = "ph string"


class StreamingParagraphDedup(BatchLedgerSink):
    """foreachBatch sink emitting cleaned documents as they arrive.

    Under `base_path`:
      docs/b{N}     batch N's (doc, clean_text, n_paras, n_kept)
      phashes/b{N}  the paragraph hashes first seen in batch N
      _log/N.json   commit marker (atomic rename; last write of batch N)

    `chunk_words` set -> fixed word-count units (delimiter-free corpora);
    otherwise paragraphs split on `sep`.

    The cross-batch anti-join drops a paragraph on its SECOND sighting,
    i.e. it implements min_df=2 across batches (within-batch still honors
    `min_df`). With the default min_df=2 and batches that arrive in
    ascending (doc, idx) order, the accumulated output equals the batch
    `paragraph_dedup` pipeline on the union exactly (test-pinned).
    """

    def __init__(
        self,
        spark,
        base_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        chunk_words: int | None = None,
        sep: str = "\n\n",
        min_df: int = 2,
        reassemble_sep: str = " ",
    ):
        super().__init__(spark, base_path)
        self.STATE_TABLES = {"docs": _DOC_SCHEMA, "phashes": _PH_SCHEMA}
        self.id_col = id_col
        self.text_col = text_col
        self.chunk_words = chunk_words
        self.sep = sep
        self.min_df = min_df
        self.reassemble_sep = reassemble_sep

    # -- committed-state readers ------------------------------------------

    def docs(self) -> DataFrame:
        """All committed cleaned documents."""
        df = self._read("docs", _DOC_SCHEMA, self._committed())
        if df is None:
            return self.spark.createDataFrame([], _DOC_SCHEMA)
        return df

    # -- the sink ----------------------------------------------------------

    def _units(self, batch: DataFrame) -> DataFrame:
        if self.chunk_words is not None:
            return word_chunk_paragraphs(
                batch, self.id_col, self.text_col, self.chunk_words
            )
        return paragraphs(batch, self.id_col, self.text_col, self.sep)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        committed = self._committed()
        if batch_id in committed:
            return  # foreachBatch redelivery after a crash: already done
        paras = self._units(batch).persist()
        try:
            kept = paragraph_dedup(paras, min_df=self.min_df)
            idx = self._read("phashes", _PH_SCHEMA, committed)
            if idx is not None:
                # cross-batch drop: the canonical copy already shipped in
                # an earlier batch — no keep_first exception here
                kept = kept.withColumn("ph", F.md5(F.col("para"))).join(
                    idx, "ph", "left_anti"
                ).drop("ph")
            reassemble_paragraph_docs(
                paras, kept, sep=self.reassemble_sep
            ).write.mode("overwrite").parquet(self._dir("docs", batch_id))

            new_ph = paras.select(F.md5(F.col("para")).alias("ph")).distinct()
            if idx is not None:
                # keep the index dup-free: only hashes FIRST seen this batch
                new_ph = new_ph.join(idx, "ph", "left_anti")
            new_ph.write.mode("overwrite").parquet(self._dir("phashes", batch_id))
            self._commit(batch_id)
        finally:
            paras.unpersist()

    def start(self, stream: DataFrame, checkpoint: str, **trigger_kwargs):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )
