"""Streaming shard export — the last leg of the crawl pipeline on an
unbounded feed: curated documents stream OUT to training shards
(jsonl.gz or TFRecord) as they arrive, instead of waiting for a batch
export over the finished corpus.

Shape: each micro-batch becomes its own namespaced shard set
(`b{batch:06d}-s{NNNNN}.<ext>`) written by the SAME deterministic batch
writers (shards.write_jsonl_shards / tfrecord.write_tfrecord_shards
with `name_prefix`), so per-batch bytes are identical to what a batch
export of exactly those documents would produce — stream==batch at the
byte level, per batch (test-pinned). The accumulated `_manifest`
parquet state (batch ledger) unions every committed batch's manifest
rows; readers list shards from the manifest, never the directory.

Exactly-once: shard writes are deterministic and atomic (tmp+rename),
so a redelivered batch overwrites its own identical files before the
marker check short-circuits it — no duplicate shards, no torn files.
Per-batch work is O(batch): the writer never re-reads exported history.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from spdb_spark.streaming.ledger import BatchLedgerSink

_MANIFEST_DDL = (
    "shard_id long, path string, n_samples long, n_members long, "
    "n_bytes long, md5 string"
)

_WRITERS = {"jsonl": "write_jsonl_shards", "tfrecord": "write_tfrecord_shards"}


class StreamingShardExporter(BatchLedgerSink):
    """foreachBatch sink exporting each micro-batch to training shards.

    Usage:
        sink = StreamingShardExporter(spark, path, fmt="tfrecord")
        q = sink.start(curated_stream, checkpoint)
        ...
        sink.manifest()     # accumulated shard manifest
    """

    STATE_TABLES = {"manifest": _MANIFEST_DDL}

    def __init__(
        self,
        spark,
        base_path: str,
        fmt: str = "jsonl",
        docs_per_shard: int = 10_000,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        if fmt not in _WRITERS:
            raise ValueError(
                f"fmt must be one of {sorted(_WRITERS)}, got {fmt!r}"
            )
        super().__init__(spark, base_path)
        self.fmt = fmt
        self.docs_per_shard = docs_per_shard
        self.text_col = text_col
        self.id_col = id_col
        self.shard_dir = os.path.join(base_path, "shards")
        os.makedirs(self.shard_dir, exist_ok=True)

    def _write_batch(self, batch_df: DataFrame, batch_id: int) -> DataFrame:
        if self.fmt == "jsonl":
            from spdb_spark.sources.shards import write_jsonl_shards as w
        else:
            from spdb_spark.sources.tfrecord import write_tfrecord_shards as w
        return w(
            batch_df,
            self.shard_dir,
            docs_per_shard=self.docs_per_shard,
            text_col=self.text_col,
            id_col=self.id_col,
            name_prefix=f"b{batch_id:06d}-s",
            write_manifest=False,
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed():
            return  # files already published (deterministic + atomic)
        if batch_df.isEmpty():
            self._commit(batch_id)
            return
        manifest = self._write_batch(batch_df, batch_id)
        manifest.write.mode("overwrite").parquet(
            self._dir("manifest", batch_id)
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

    def manifest(self) -> DataFrame:
        state = self._read_state("manifest", _MANIFEST_DDL)
        if state is None:
            return self.spark.createDataFrame([], _MANIFEST_DDL)
        return state
