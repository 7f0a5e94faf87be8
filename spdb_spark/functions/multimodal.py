"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched kernels.

The container has no media libraries, so the decode step is STUBBED with a
deterministic fake (clearly marked); everything Spark-cares-about — schema,
binary payload handling, partitioning, mapInPandas batch shape, UDF
signatures — is real and tested. Swap `_fake_decode` for a real
PIL/librosa/ffmpeg call in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA_FIELDS = """
    media_id  long      — stable id
    kind      string    — image | audio | video
    payload   binary    — opaque encoded bytes
    n_bytes   long      — payload size (metadata, prunable without decode)
    checksum  string    — md5 of payload for integrity/dedup
"""

FRAME_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("status", StringType(), False),
    ]
)


def with_media_columns(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Project a table into the media layout: binary payload + metadata
    columns computed WITHOUT decoding (JVM-side; at 100TB the metadata
    columns live in parquet stats and prune scans)."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.octet_length(F.col(payload_col).cast("binary")).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("checksum"),
    )


def _fake_decode(payload: bytes, n_frames: int, dim: int) -> np.ndarray:
    """STUB — deterministic fake feature extraction. Real deployments
    replace this with the actual decoder (PIL / torchaudio / pyav); the
    surrounding Spark plumbing does not change."""
    seed = int(hashlib.md5(payload).hexdigest()[:8], 16)
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_frames, dim), dtype=np.float32)


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("payload", StringType(), False),  # placeholder: hex digest of resized bytes
        StructField("status", StringType(), False),
    ]
)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Resize kernel plumbing (mapInPandas, Arrow-batched). STUB decode:
    emits a deterministic digest standing in for the resized payload —
    replace `_fake_resize` with PIL `Image.resize` in production; schema,
    batching, and error handling are the real thing."""

    def _fake_resize(payload: bytes, w: int, h: int) -> str:
        return hashlib.md5(payload + f":{w}x{h}".encode()).hexdigest()

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    out.append(
                        (int(row.media_id), width, height,
                         _fake_resize(bytes(row.payload), width, height), "ok")
                    )
                except Exception as e:
                    out.append((int(row.media_id), width, height, "", f"error: {e}"))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "payload", "status"]
            )

    return media.select("media_id", "payload").mapInPandas(kernel, RESIZE_SCHEMA)


def extract_frame_features(
    media: DataFrame, n_frames: int = 4, dim: int = 16
) -> DataFrame:
    """Frame-sample + featurize each payload via mapInPandas (Arrow batches;
    one Python invocation per batch of media rows, numpy per row).

    Deterministic stub decode — see `_fake_decode`. Output one row per
    (media_id, frame_idx)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                try:
                    feats = _fake_decode(bytes(row.payload), n_frames, dim)
                    for i in range(n_frames):
                        out.append(
                            (int(row.media_id), i, feats[i].tolist(), "ok")
                        )
                except Exception as e:  # corrupt payloads must not kill the job
                    out.append((int(row.media_id), -1, None, f"error: {e}"))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "feature", "status"]
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, FRAME_FEATURES_SCHEMA
    )
