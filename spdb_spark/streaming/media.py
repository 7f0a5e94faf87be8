"""Incremental multimodal ingest: a Structured Streaming shard-watcher.

New .tar[.gz] WebDataset shards landing in a directory flow through the
SAME kernels as batch ingest — member walk (sources/webdataset.py),
header-only probe (functions/probe.py), metadata prune, Arrow decode
(functions/multimodal.py) — into an append-only parquet feature sink.
Exactly-once per shard comes from the file-source checkpoint (Spark
tracks which shard files each batch consumed; a restarted query neither
re-decodes nor drops shards), which is the right granularity because a
shard is the ingest unit at corpus scale.

Stream == batch by construction: every stage is a stateless projection
shared with the batch path, so the equivalence test in
tests/test_streaming_media.py pins identical output rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_webdataset_members(
    spark: SparkSession, shard_dir: str, container: str = "tar"
) -> DataFrame:
    """readStream over a shard directory: one row per member of each
    newly-arrived shard. The binaryFile source needs its fixed schema
    spelled out when streaming. container: "tar" (WebDataset) or "zip" —
    both member walks are stateless kernels emitting the same schema, so
    everything downstream is container-agnostic."""
    from spdb_spark.sources.webdataset import webdataset_members
    from spdb_spark.sources.zipshard import zip_members

    raw = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .load(shard_dir)
    )
    return {"tar": webdataset_members, "zip": zip_members}[container](raw)


MEDIA_FEATURE_SCHEMA = (
    "key string, ext string, frame_idx int, feature array<float>, "
    "status string"
)


def media_feature_rows(
    members: DataFrame, min_width: int = 0, n_frames: int = 2, dim: int = 4
) -> DataFrame:
    """The shared probe -> prune -> decode projection (batch or stream):
    member rows -> (key, ext, frame_idx, feature, status) for payloads
    whose header survives the metadata prune (images at least min_width
    wide; audio and other dimensionless containers always). ONE stateless
    Arrow kernel — probing and pruning happen before the decode inside
    the same pass, so a stream never needs a stateful self-join and a
    pruned payload costs only its header read, never a decode."""
    from collections.abc import Iterator

    import pandas as pd

    from spdb_spark.functions.multimodal import decode_features_status
    from spdb_spark.functions.probe import probe_payload

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["key", "ext", "frame_idx", "feature", "status"]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                try:
                    _container, f = probe_payload(payload)
                except Exception:
                    f = {"width": None}
                w = f.get("width")
                if w is not None and w < min_width:
                    continue  # pruned on header metadata: no decode
                try:
                    feats, status = decode_features_status(
                        payload, n_frames, dim
                    )
                    for i in range(n_frames):
                        rows.append(
                            (r.key, r.ext, i, feats[i].tolist(), status)
                        )
                except Exception as e:
                    rows.append((r.key, r.ext, -1, None, f"error: {e}"))
            yield pd.DataFrame(rows, columns=cols)

    return members.select("key", "ext", "payload").mapInPandas(
        kernel, MEDIA_FEATURE_SCHEMA
    )


def start_media_feature_stream(
    spark: SparkSession,
    shard_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    min_width: int = 0,
    n_frames: int = 2,
    dim: int = 4,
    container: str = "tar",
):
    """Start (availableNow) the shard-watcher: decode features for every
    not-yet-processed shard, append to the parquet sink, stop when the
    backlog drains. Call again after more shards land — the checkpoint
    carries the processed-shard set, so work is incremental."""
    members = stream_webdataset_members(spark, shard_dir, container)
    rows = media_feature_rows(members, min_width, n_frames, dim)
    return (
        rows.writeStream.format("parquet")
        .option("path", sink_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
