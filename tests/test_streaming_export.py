"""StreamingShardExporter: per-batch bytes identical to the batch
writers, manifest-driven read-back equals the input union, redelivery
no-op, both formats."""

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F

from spdb_spark.streaming.export import StreamingShardExporter


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"streamed doc {i}") for i in range(lo, hi)],
        "doc_id long, text string",
    )


def _run_stream(spark, tmp_path, fmt, batches):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, (lo, hi) in enumerate(batches):
        _docs(spark, lo, hi).coalesce(1).write.parquet(f"{src}/p{i}")
    sink = StreamingShardExporter(
        spark, str(tmp_path / "out"), fmt=fmt, docs_per_shard=10
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = sink.start(stream, str(tmp_path / "ckpt"), availableNow=True)
    assert q.awaitTermination(300), "export stream did not finish"
    return sink


def test_jsonl_export_reads_back(spark, tmp_path):
    sink = _run_stream(spark, tmp_path, "jsonl", [(0, 25), (25, 40)])
    manifest = sink.manifest().collect()
    assert sum(r.n_samples for r in manifest) == 40
    got = {}
    for r in manifest:
        with gzip.open(r.path) as f:
            for line in f.read().decode().splitlines():
                obj = json.loads(line)
                got[obj["doc_id"]] = obj["text"]
    assert got == {i: f"streamed doc {i}" for i in range(40)}
    # batch namespacing: batch 0 shards never collide with batch 1's
    names = {os.path.basename(r.path) for r in manifest}
    assert all(n.startswith(("b000000-s", "b000001-s")) for n in names)


def test_per_batch_bytes_equal_batch_writer(spark, tmp_path):
    from spdb_spark.sources.shards import write_jsonl_shards

    sink = _run_stream(spark, tmp_path, "jsonl", [(0, 25), (25, 40)])
    stream_md5 = {
        os.path.basename(r.path): r.md5 for r in sink.manifest().collect()
    }
    ref = str(tmp_path / "ref")
    batch_md5 = {}
    for bid, (lo, hi) in enumerate([(0, 25), (25, 40)]):
        m = write_jsonl_shards(
            _docs(spark, lo, hi),
            ref,
            docs_per_shard=10,
            name_prefix=f"b{bid:06d}-s",
            write_manifest=False,
        )
        batch_md5.update(
            {os.path.basename(r.path): r.md5 for r in m.collect()}
        )
    assert stream_md5 == batch_md5


def test_tfrecord_export_reads_back(spark, tmp_path):
    from spdb_spark.sources.tfrecord import tf_example_decode, tfrecord_iter

    sink = _run_stream(spark, tmp_path, "tfrecord", [(0, 12), (12, 30)])
    got = {}
    for r in sink.manifest().collect():
        with open(r.path, "rb") as f:
            for _, payload in tfrecord_iter(f.read()):
                feats = tf_example_decode(payload)
                got[feats["doc_id"][0]] = feats["text"][0].decode()
    assert got == {i: f"streamed doc {i}" for i in range(30)}


def test_redelivery_noop(spark, tmp_path):
    sink = StreamingShardExporter(
        spark, str(tmp_path / "out"), fmt="jsonl", docs_per_shard=10
    )
    batch = _docs(spark, 0, 15)
    sink.process_batch(batch, 0)
    files = sorted(glob.glob(os.path.join(sink.shard_dir, "*")))
    rows = sorted((r.path, r.md5) for r in sink.manifest().collect())
    sink.process_batch(batch, 0)  # redelivered
    assert sorted(glob.glob(os.path.join(sink.shard_dir, "*"))) == files
    assert sorted((r.path, r.md5) for r in sink.manifest().collect()) == rows


def test_empty_batch_commits(spark, tmp_path):
    sink = StreamingShardExporter(spark, str(tmp_path / "out"))
    sink.process_batch(_docs(spark, 0, 0), 0)
    assert sink.manifest().count() == 0
    assert 0 in sink._committed()


def test_invalid_fmt(spark, tmp_path):
    with pytest.raises(ValueError, match="fmt"):
        StreamingShardExporter(spark, str(tmp_path / "out"), fmt="csv")
