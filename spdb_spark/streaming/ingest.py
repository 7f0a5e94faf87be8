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
