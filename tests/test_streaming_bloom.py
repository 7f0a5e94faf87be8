"""StreamingBloomFilter: stream == batch bitmap identity, redelivery
no-op, reopen/param guard, compaction state preservation."""

import os

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.membership import bloom_build, bloom_probe
from spdb_spark.streaming.bloom import StreamingBloomFilter

M, K = 600, 3


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("url://k"), F.col("id")).alias("key"),
    )


def _probe_set(df):
    return {(r.doc_id, r.maybe_member) for r in df.collect()}


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, (lo, hi) in enumerate([(0, 40), (40, 80), (80, 120)]):
        _keys(spark, lo, hi).coalesce(1).write.parquet(f"{src}/p{i}")

    sink = StreamingBloomFilter(spark, str(tmp_path / "bloom"), M, K)
    stream = (
        spark.readStream.schema("doc_id long, key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = sink.start(stream, str(tmp_path / "ckpt"), availableNow=True)
    assert q.awaitTermination(300), "bloom stream did not finish"

    probes = _keys(spark, 0, 200)  # includes 80 never-ingested keys
    got = sink.probe(probes, "key")
    want = bloom_probe(
        probes, "key", bloom_build(_keys(spark, 0, 120), "key", M, K), M, K
    )
    assert _probe_set(got) == _probe_set(want)
    # every ingested key reports maybe-seen (no false negatives)
    seen = {r.doc_id: r.maybe_member for r in got.collect()}
    assert all(seen[i] for i in range(120))


def test_redelivery_noop(spark, tmp_path):
    sink = StreamingBloomFilter(spark, str(tmp_path / "b"), M, K)
    batch = _keys(spark, 0, 50)
    sink.process_batch(batch, 0)
    before = {(r.word_idx, r.bits) for r in sink.filter_df().collect()}
    sink.process_batch(batch, 0)  # redelivered
    after = {(r.word_idx, r.bits) for r in sink.filter_df().collect()}
    assert before == after


def test_reopen_and_param_guard(spark, tmp_path):
    path = str(tmp_path / "b")
    sink = StreamingBloomFilter(spark, path, M, K)
    sink.process_batch(_keys(spark, 0, 30), 0)
    reopened = StreamingBloomFilter(spark, path, M, K)
    assert reopened.probe(_keys(spark, 0, 30), "key").where(
        ~F.col("maybe_member")
    ).count() == 0
    with pytest.raises(ValueError, match="built with"):
        StreamingBloomFilter(spark, path, M, K + 1)


def test_compact_preserves_filter(spark, tmp_path):
    sink = StreamingBloomFilter(spark, str(tmp_path / "b"), M, K)
    for i, (lo, hi) in enumerate([(0, 30), (30, 60), (60, 90)]):
        sink.process_batch(_keys(spark, lo, hi), i)
    before = {(r.word_idx, r.bits) for r in sink.filter_df().collect()}
    sink.compact()
    sink.vacuum()
    after = {(r.word_idx, r.bits) for r in sink.filter_df().collect()}
    assert before == after
    # post-compact appends still fold in
    sink.process_batch(_keys(spark, 90, 100), 3)
    assert sink.probe(_keys(spark, 90, 100), "key").where(
        ~F.col("maybe_member")
    ).count() == 0


def test_empty_filter_probe_all_false(spark, tmp_path):
    sink = StreamingBloomFilter(spark, str(tmp_path / "b"), M, K)
    got = sink.probe(_keys(spark, 0, 10), "key")
    assert got.where(F.col("maybe_member")).count() == 0
