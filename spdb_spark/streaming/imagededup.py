"""Streaming image near-duplicate detection: each micro-batch of media
payloads is pHashed, checked for near-dups within the batch AND against
every image ingested before it, and the signature index grows
incrementally — the image twin of `streaming/neardup.py` (text MinHash).

Simpler state than the text path: a pHash is one long per image, so the
index is just committed (media_id, phash) rows — no shingle corpus to
re-verify against. Per micro-batch work is O(batch x matching band
buckets), never O(corpus^2): the batch probes the corpus through the
banded equi-join in `functions/phash.cross_hamming_pairs` with the
batch side broadcast, so the corpus side never shuffles.

Exactly-once via the `BatchLedgerSink` pattern (per-batch subdirs +
atomic-rename ledger): a foreachBatch redelivery either finds its
ledger entry (skip) or overwrites its own partial output and commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.phash import (
    cross_hamming_pairs,
    image_phash,
    phash_neardup_pairs,
)
from spdb_spark.streaming.ledger import BatchLedgerSink

_PAIR_SCHEMA = "id_a long, id_b long, hamming int, batch_id long"
_SIG_SCHEMA = "media_id long, phash long"


class StreamingImageDedup(BatchLedgerSink):
    """foreachBatch sink flagging near-duplicate images as they arrive.

    Under `base_path`:
      pairs/b{N}  (id_a, id_b, hamming, batch_id) flagged in batch N
      sigs/b{N}   batch N's (media_id, phash) signature slice
      _log/N.json commit marker (atomic rename; last write of batch N)

    Within-batch pairs have id_a < id_b; cross-batch pairs have
    id_a = the earlier (corpus) image, id_b = the newly arrived one.
    """

    STATE_TABLES = {"pairs": _PAIR_SCHEMA, "sigs": _SIG_SCHEMA}

    def __init__(
        self,
        spark,
        base_path: str,
        id_col: str = "media_id",
        payload_col: str = "payload",
        bands: int = 4,
        max_hamming: int = 3,
        hasher=None,
    ):
        """`hasher` maps a (id, payload) DataFrame to PHASH_SCHEMA rows
        (media_id, phash, status) — default `phash.image_phash`; pass
        `phash.video_phashes` or an `afp.audio_fingerprints` wrapper
        (select afp_sig as phash) to dedup those modalities through the
        identical sink: the index/pair machinery only sees 64-bit
        signatures."""
        super().__init__(spark, base_path)
        self.id_col = id_col
        self.payload_col = payload_col
        self.bands = bands
        self.max_hamming = max_hamming
        self.hasher = hasher

    def pairs(self) -> DataFrame:
        """All committed near-dup pairs."""
        df = self._read("pairs", _PAIR_SCHEMA, self._committed())
        if df is None:
            return self.spark.createDataFrame([], _PAIR_SCHEMA)
        return df

    def signatures(self) -> DataFrame:
        """All committed image signatures (the growing index)."""
        df = self._read("sigs", _SIG_SCHEMA, self._committed())
        if df is None:
            return self.spark.createDataFrame([], _SIG_SCHEMA)
        return df

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        committed = self._committed()
        if batch_id in committed:
            return  # redelivery after a crash: already done
        hash_fn = self.hasher or image_phash
        hashed = (
            hash_fn(batch, self.id_col, self.payload_col)
            .where(F.col("phash").isNotNull())
            .persist()
        )
        try:
            within = phash_neardup_pairs(
                hashed, bands=self.bands, max_hamming=self.max_hamming
            )
            idx = self._read("sigs", _SIG_SCHEMA, committed)
            if idx is not None:
                cross = cross_hamming_pairs(
                    hashed,
                    idx,
                    bands=self.bands,
                    max_hamming=self.max_hamming,
                ).select(
                    F.col("corpus_id").alias("id_a"),
                    F.col("new_id").alias("id_b"),
                    "hamming",
                )
                within = within.unionByName(cross)
            out = within.withColumn("batch_id", F.lit(batch_id).cast("long"))
            out.write.mode("overwrite").parquet(self._dir("pairs", batch_id))
            hashed.select("media_id", "phash").write.mode("overwrite").parquet(
                self._dir("sigs", batch_id)
            )
            self._commit(batch_id)
        finally:
            hashed.unpersist()

    def start(self, stream: DataFrame, checkpoint: str, **trigger_kwargs):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**trigger_kwargs)
            .start()
        )
