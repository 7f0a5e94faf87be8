"""Streaming deduplication — drop replayed/duplicate events inside a
bounded state window.

Reference parity: the reference's write path dedups redundant cuboid
writes via its Redis write-buffer keys (spdb/spatialdb/state.py-style
cache-key idempotency). Spark-first, the same guarantee is
`dropDuplicatesWithinWatermark`: state is bounded by the watermark
horizon (old keys age out of the state store), so an at-least-once
upstream (Kafka replays, page-in retries) becomes effectively-once
downstream without unbounded memory.

Batch DataFrames take the plain `dropDuplicates` path, which is how the
tests cross-check streaming output against batch semantics.

Scale notes (100 TB / 1000 executors):
- State is hash-partitioned by the dedup key across executors; per-key
  state is one small row. Memory = (distinct keys in the watermark
  horizon) / (number of state partitions) — pick the watermark from the
  real replay window, not "1 day to be safe".
- RocksDB state store (`spark.sql.streaming.stateStore.providerClass`)
  keeps hot state off-heap when key cardinality is large.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    keys: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first occurrence of each key; duplicates arriving within
    the watermark horizon of the first are dropped.

    Streaming input -> `dropDuplicatesWithinWatermark` (bounded state:
    a key's state is evicted once the watermark passes its event time,
    so a duplicate arriving later than `watermark` after the original
    MAY be re-emitted — the contract matches the upstream replay bound).
    Batch input -> `dropDuplicates` (exact, whole-input).
    """
    keys = list(keys)
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
