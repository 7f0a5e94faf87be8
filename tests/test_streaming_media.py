"""Streaming shard-watcher tests: stream == batch through the shared
probe->prune->decode kernel, incremental exactly-once shard processing
across restarts, and no reprocessing when nothing new lands."""

import numpy as np
import pytest

from spdb_spark.sources.webdataset import ingest_webdataset, wds_encode
from spdb_spark.streaming.media import (
    media_feature_rows,
    start_media_feature_stream,
)


def _shard(seed: int) -> bytes:
    from spdb_spark.functions.audio import wav_encode
    from spdb_spark.functions.gif import gif_encode
    from spdb_spark.operators.render import png_encode

    rng = np.random.default_rng(seed)
    samples = {}
    for i in range(4):
        key = f"{seed:03d}{i:03d}"
        size = 32 if i % 2 == 0 else 8  # half get pruned at min_width=16
        img = rng.integers(0, 256, (size, size), dtype=np.uint8)
        samples[key] = {
            "png": png_encode(img),
            "gif": gif_encode(img),
            "txt": f"caption {key}".encode(),  # unknown container: kept
        }
    samples[f"{seed:03d}wav"] = {
        "wav": wav_encode(rng.integers(-100, 100, 500, dtype=np.int16))
    }
    return wds_encode(samples)


def _collect_sorted(df):
    return sorted(
        (r.key, r.ext, r.frame_idx, r.status, tuple(r.feature or []))
        for r in df.collect()
    )


def test_stream_equals_batch_and_incremental(spark, tmp_path):
    shards = tmp_path / "shards"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    shards.mkdir()
    (shards / "s1.tar").write_bytes(_shard(1))

    q = start_media_feature_stream(
        spark, str(shards), sink, ckpt, min_width=16, n_frames=2, dim=3
    )
    q.awaitTermination(120)
    got1 = _collect_sorted(spark.read.parquet(sink))
    batch1 = _collect_sorted(
        media_feature_rows(
            ingest_webdataset(spark, str(shards)), min_width=16, n_frames=2, dim=3
        )
    )
    assert got1 == batch1 and len(got1) > 0
    # pruning really happened: the 8px images are absent, wav present
    exts = {(k[:6], e) for k, e, *_ in got1}
    assert ("001001", "png") not in {(k, e) for k, e, *_ in got1}
    assert any(e == "wav" for _k, e, *_ in got1)
    # txt payloads decode as labeled stubs, not errors
    statuses = {s for _k, e, _f, s, _v in got1 if e == "txt"}
    assert statuses == {"stub"}

    # second shard lands: availableNow again with the SAME checkpoint
    (shards / "s2.tar").write_bytes(_shard(2))
    q = start_media_feature_stream(
        spark, str(shards), sink, ckpt, min_width=16, n_frames=2, dim=3
    )
    q.awaitTermination(120)
    got2 = _collect_sorted(spark.read.parquet(sink))
    batch2 = _collect_sorted(
        media_feature_rows(
            ingest_webdataset(spark, str(shards)), min_width=16, n_frames=2, dim=3
        )
    )
    assert got2 == batch2  # incremental union == batch over everything

    # nothing new: a third run appends zero rows (exactly-once per shard)
    q = start_media_feature_stream(
        spark, str(shards), sink, ckpt, min_width=16, n_frames=2, dim=3
    )
    q.awaitTermination(120)
    got3 = _collect_sorted(spark.read.parquet(sink))
    assert got3 == got2


def test_zip_shards_through_the_watcher(spark, tmp_path):
    """The zip member walk is the same stateless kernel shape, so the
    watcher consumes zip shard directories with container='zip'."""
    import numpy as np

    from spdb_spark.operators.render import png_encode
    from spdb_spark.sources.zipshard import zip_encode
    from spdb_spark.streaming.media import start_media_feature_stream

    rng = np.random.default_rng(20)
    samples = {
        f"{i:03d}": {"png": png_encode(rng.integers(0, 256, (12, 12), dtype=np.uint8))}
        for i in range(6)
    }
    shard_dir = tmp_path / "shards"; shard_dir.mkdir()
    (shard_dir / "s0.zip").write_bytes(zip_encode(samples))
    sink = str(tmp_path / "sink"); ckpt = str(tmp_path / "ckpt")
    q = start_media_feature_stream(
        spark, str(shard_dir), sink, ckpt, n_frames=2, dim=3, container="zip"
    )
    q.awaitTermination(120)
    out = spark.read.parquet(sink)
    assert out.count() == 12  # 6 members x 2 frames
    assert {r["status"] for r in out.collect()} == {"ok"}
    # incremental: a second zip shard adds only its own rows
    (shard_dir / "s1.zip").write_bytes(
        zip_encode({"x": {"png": png_encode(np.zeros((8, 8), np.uint8))}})
    )
    q2 = start_media_feature_stream(
        spark, str(shard_dir), sink, ckpt, n_frames=2, dim=3, container="zip"
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(sink).count() == 14
