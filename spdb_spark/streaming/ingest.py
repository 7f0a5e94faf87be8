"""Structured Streaming ingest: the Spark-native replacement for the
reference's write-buffer -> SQS -> Lambda flush pipeline (SURVEY.md §2.8;
kvio.py:84-109, object.py:729-763, state.py:219-330).

Incoming voxel batches (file/Kafka/rate source) land in micro-batches;
each batch applies the same non-zero-overwrite merge as write_cuboid with
latest-write-wins ordering INSIDE the batch (the reference serializes
concurrent writes via its page-out set + delayed-write queue — here a
row_number over a monotonic sequence column does it declaratively), then
commits atomically. Readers always see a consistent snapshot (the
dirty-key read barrier, rediskvio.py:260-286, is obviated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VOXEL_KEY = ["lookup_key", "resolution", "t", "x", "y", "z"]


def latest_wins(batch: DataFrame, seq_col: str = "seq") -> DataFrame:
    """Collapse a micro-batch to one row per voxel, keeping the highest
    sequence number (arrival order) — in-batch write serialization."""
    w = Window.partitionBy(*VOXEL_KEY).orderBy(F.desc(seq_col))
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", seq_col)
    )


def merge_batch(existing: DataFrame, batch: DataFrame, seq_col: str = "seq") -> DataFrame:
    """Non-zero-overwrite merge of a deduplicated micro-batch into the
    stored voxel state (same semantics as operators.voxel.overwrite_merge,
    but keyed by the full voxel key incl. lookup_key/resolution)."""
    b = latest_wins(batch, seq_col).select(
        *VOXEL_KEY, F.col("value").alias("new_value")
    )
    return (
        existing.join(b, on=VOXEL_KEY, how="full_outer")
        .select(
            *VOXEL_KEY,
            F.coalesce(
                F.nullif(F.col("new_value"), F.lit(0)), F.col("value"), F.lit(0)
            ).alias("value"),
        )
        .where(F.col("value") != 0)
    )


class StreamingVoxelIngest:
    """foreachBatch sink maintaining a voxel table under `table_path`.

    With Delta/Iceberg this becomes `MERGE INTO` per micro-batch; on plain
    parquet we stage-and-swap the whole (small test-scale) table. The
    streaming topology (readStream -> transform -> writeStream/foreachBatch)
    is identical either way.
    """

    def __init__(self, spark, table_path: str):
        self.spark = spark
        self.table_path = table_path
        self._version = 0

    def read_state(self) -> DataFrame:
        import os

        from spdb_spark.schema import VOXEL_SCHEMA

        if not os.path.exists(self.table_path):
            return self.spark.createDataFrame([], VOXEL_SCHEMA)
        return self.spark.read.parquet(self.table_path)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        merged = merge_batch(self.read_state(), batch)
        staged = merged.cache()
        staged.count()
        staged.write.mode("overwrite").parquet(self.table_path)
        staged.unpersist()
        self._version += 1

    def start(self, stream: DataFrame, checkpoint: str, **trigger_kwargs):
        """Attach to a streaming DataFrame of voxel rows + seq column."""
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .outputMode("update")
            .trigger(**(trigger_kwargs or {"availableNow": True}))
            .start()
        )


class TransactionalVoxelIngest(StreamingVoxelIngest):
    """Exactly-once foreachBatch sink: versioned snapshots + a batch-id
    commit ledger.

    foreachBatch is at-least-once — after a crash between the sink write
    and the checkpoint commit, Spark redelivers the same (batch, batch_id).
    Exactly-once therefore needs the sink to be (a) atomic per batch and
    (b) idempotent on batch_id. Here:

    - each batch's merged state lands in its own directory
      `data_v{batch_id}` (never mutated after),
    - the commit is a ledger file created with an atomic POSIX rename —
      readers either see the previous snapshot or the new one, never a
      half-written table,
    - a redelivered batch_id is found in the ledger and skipped.

    This is the transaction-log pattern Delta/Iceberg implement for real
    object stores (their MERGE INTO + idempotent txn app-id/version); the
    interface is identical, so swapping the storage layer changes no
    streaming topology. Old snapshots remain readable (time travel) until
    `vacuum`.
    """

    def __init__(self, spark, table_path: str):
        super().__init__(spark, table_path)
        import os

        self._log_dir = os.path.join(table_path, "_txn_log")
        os.makedirs(self._log_dir, exist_ok=True)

    def _committed(self) -> list[int]:
        import os

        return sorted(
            int(f[:-5])
            for f in os.listdir(self._log_dir)
            if f.endswith(".json")
        )

    def _data_dir(self, batch_id: int) -> str:
        import os

        return os.path.join(self.table_path, f"data_v{batch_id}")

    def read_state(self, version: int | None = None) -> DataFrame:
        from spdb_spark.schema import VOXEL_SCHEMA

        committed = self._committed()
        if version is not None:
            if version not in committed:
                raise ValueError(f"version {version} not committed: {committed}")
        elif committed:
            version = committed[-1]
        else:
            return self.spark.createDataFrame([], VOXEL_SCHEMA)
        return self.spark.read.parquet(self._data_dir(version))

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        import json
        import os
        import tempfile

        if batch_id in self._committed():
            return  # redelivered batch: already durable, skip
        merged = merge_batch(self.read_state(), batch)
        merged.write.mode("overwrite").parquet(self._data_dir(batch_id))
        # atomic commit: rename is the transaction boundary
        fd, tmp = tempfile.mkstemp(dir=self._log_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"batch_id": batch_id, "dir": f"data_v{batch_id}"}, f)
        os.rename(tmp, os.path.join(self._log_dir, f"{batch_id}.json"))
        self._version = batch_id

    def vacuum(self, keep_last: int = 2) -> None:
        """Drop snapshot directories older than the last `keep_last`
        committed versions (their ledger entries go too)."""
        import os
        import shutil

        committed = self._committed()
        for bid in committed[:-keep_last] if keep_last else committed:
            shutil.rmtree(self._data_dir(bid), ignore_errors=True)
            os.remove(os.path.join(self._log_dir, f"{bid}.json"))
