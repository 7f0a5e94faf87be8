"""Streaming semantic (embedding-space) dedup: each micro-batch of
vectors is checked against everything ingested before it (and against
itself) under a FROZEN coarse quantizer, and the bucketed vector state
grows incrementally — the SemDeDup analogue of StreamingNearDup's
MinHash band index.

Composition of existing pieces, not new math: per batch,
`ivf.assign_lists` buckets the batch into its n_probe nearest frozen
centroids; within-batch pairs score bucket-locally; cross-batch pairs
join the batch's buckets against the committed corpus state on
centroid_id and re-score exactly — the same bit-reproducible prenormed
cosine fold, rounded to 6dp, tau-filtered. The expensive invariant
holds: the corpus is NEVER re-paired with itself — per micro-batch work
is O(batch x matching buckets), not O(corpus^2).

stream == batch EXACTLY: a pair lands in some batch's output iff its
members share a probed bucket (bucket assignment depends only on the
frozen quantizer, so it's arrival-order-independent) and its rounded
cosine clears tau — the union over batches therefore equals
`semantic_dedup_pairs(union_corpus, cents=frozen)` as a (id_a, id_b,
cos_sim) set, for ANY batch split (test-pinned). The quantizer must be
frozen for this to hold (train it offline on a representative sample —
the StreamingVectorIndex contract); re-train by rebuilding when drift
matters (recall quality, not correctness).

Exactly-once: per-batch subdirectories plus the atomic-rename ledger
(BatchLedgerSink) — a redelivered batch either finds its ledger entry
(skip) or overwrites its own partial output and commits. At 100 TB the
vecs state is a bucketed table on centroid_id so the probe join
co-locates without shuffling the corpus side; compaction via the
inherited compact()/vacuum().

Sizing the frozen quantizer: per-batch cross work is
O(batch x bucket), and buckets grow as corpus/k under a FIXED k — so
train with k sized for the TARGET corpus (ivf.auto_k(n_target), not
auto_k(bootstrap)); at the tau >= ~0.9 near-dup regime a small fixed
n_probe then holds recall while bucket scans stay bounded (the
semantic_dedup_pairs auto-k argument, frozen at stream start).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.ivf import assign_lists
from spdb_spark.functions.similarity import cosine_prenormed, norm
from spdb_spark.streaming.ledger import BatchLedgerSink

_PAIR_SCHEMA = "id_a long, id_b long, cos_sim double, batch_id long"
_VEC_SCHEMA = "vid long, centroid_id int, v array<double>"


class StreamingSemanticDedup(BatchLedgerSink):
    """foreachBatch sink flagging embedding near-dup vectors on arrival.

    Under `base_path` (layout + compaction: streaming/ledger.py):
      pairs/b{N}   (id_a, id_b, cos_sim, batch_id) flagged in batch N
      vecs/b{N}    batch N's bucketed vectors (probe state)
      _log/N.json  commit marker (atomic rename; last write of batch N)

    `cents` is the frozen coarse quantizer (centroid_id, centroid_vec)
    — the same table `semantic_dedup_pairs(cents=...)` takes, so one
    quantizer serves the batch baseline and the stream.
    """

    STATE_TABLES = {"pairs": _PAIR_SCHEMA, "vecs": _VEC_SCHEMA}

    def __init__(
        self,
        spark,
        base_path: str,
        cents: DataFrame,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        tau: float = 0.92,
        n_probe: int = 3,
    ):
        super().__init__(spark, base_path)
        self.id_col = id_col
        self.vec_col = vec_col
        self.tau = tau
        self.n_probe = n_probe
        # freeze the quantizer as driver-side literals once: batches
        # broadcast it; k rows — bytes, not data
        self._cents = spark.createDataFrame(
            [
                (int(r["centroid_id"]), [float(x) for x in r["centroid_vec"]])
                for r in cents.collect()
            ],
            schema="centroid_id int, centroid_vec array<double>",
        )

    # -- committed-state readers ------------------------------------------

    def pairs(self) -> DataFrame:
        """All committed near-dup pairs (id_a < id_b)."""
        df = self._read_state("pairs", _PAIR_SCHEMA)
        if df is None:
            return self.spark.createDataFrame([], _PAIR_SCHEMA)
        return df

    # -- scoring -----------------------------------------------------------

    def _score(self, a: DataFrame, b: DataFrame) -> DataFrame:
        """Exact pair scoring within shared buckets — the same rounded
        prenormed-cosine fold as semantic_dedup_pairs' Catalyst form, so
        streamed scores are bit-identical to the batch baseline's."""
        left = a.select(
            F.col("vid").alias("id_a"), F.col("v").alias("va"), "centroid_id"
        ).withColumn("na", norm(F.col("va")))
        right = b.select(
            F.col("vid").alias("id_b"), F.col("v").alias("vb"), "centroid_id"
        ).withColumn("nb", norm(F.col("vb")))
        return (
            left.join(right, "centroid_id")
            .where(F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                F.round(
                    cosine_prenormed(
                        F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                    ),
                    6,
                ).alias("cos_sim"),
            )
            .where(F.col("cos_sim") >= self.tau)
            .dropDuplicates(["id_a", "id_b"])
        )

    # -- the sink ----------------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        committed = self._committed()
        if batch_id in committed:
            return  # foreachBatch redelivery after a crash: already done
        lists = assign_lists(
            batch, self._cents, self.id_col, self.vec_col, n_probe=self.n_probe
        ).persist()
        try:
            within = self._score(lists, lists)
            history = self._read("vecs", _VEC_SCHEMA, committed)
            if history is not None:
                # one bucket join covers both id orientations via
                # least/greatest (the cosine fold is elementwise, so the
                # score is bit-identical either way round)
                left = history.select(
                    F.col("vid").alias("ha"), F.col("v").alias("va"),
                    "centroid_id",
                ).withColumn("na", norm(F.col("va")))
                right = lists.select(
                    F.col("vid").alias("hb"), F.col("v").alias("vb"),
                    "centroid_id",
                ).withColumn("nb", norm(F.col("vb")))
                cross = (
                    left.join(right, "centroid_id")
                    .where(F.col("ha") != F.col("hb"))
                    .select(
                        F.least("ha", "hb").alias("id_a"),
                        F.greatest("ha", "hb").alias("id_b"),
                        F.round(
                            cosine_prenormed(
                                F.col("va"), F.col("vb"),
                                F.col("na"), F.col("nb"),
                            ),
                            6,
                        ).alias("cos_sim"),
                    )
                    .where(F.col("cos_sim") >= self.tau)
                    .dropDuplicates(["id_a", "id_b"])
                )
                found = within.unionByName(cross).dropDuplicates(
                    ["id_a", "id_b"]
                )
            else:
                found = within
            (
                found.withColumn("batch_id", F.lit(batch_id).cast("long"))
                .write.mode("overwrite")
                .parquet(self._dir("pairs", batch_id))
            )
            (
                lists.select("vid", "centroid_id", "v")
                .write.mode("overwrite")
                .parquet(self._dir("vecs", batch_id))
            )
        finally:
            lists.unpersist()
        self._commit(batch_id)

    def start(self, stream: DataFrame, checkpoint: str, **trigger_kwargs):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )
