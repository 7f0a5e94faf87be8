"""StreamingCountMin: stream == batch cell identity, redelivery no-op
(critical: sum is NOT idempotent, the ledger carries exactly-once),
reopen/param guard, compaction state preservation."""

import os

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.sketch import countmin_build
from spdb_spark.streaming.sketch import StreamingCountMin

W, D = 64, 3


def _occ(spark, lo, hi):
    # key space of 20 so batches overlap keys (cells must SUM across
    # batches, not OR)
    return spark.range(lo, hi).select(
        F.col("id").alias("occ_id"),
        F.concat(F.lit("k"), F.col("id") % 20).alias("key"),
    )


def _cells(df):
    return {(r.row, r.bucket): r.cnt for r in df.collect()}


def test_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i, (lo, hi) in enumerate([(0, 100), (100, 250), (250, 300)]):
        _occ(spark, lo, hi).coalesce(1).write.parquet(f"{src}/p{i}")

    sink = StreamingCountMin(spark, str(tmp_path / "cm"), W, D)
    stream = (
        spark.readStream.schema("occ_id long, key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = sink.start(stream, str(tmp_path / "ckpt"), availableNow=True)
    assert q.awaitTermination(300), "count-min stream did not finish"

    assert _cells(sink.sketch_df()) == _cells(
        countmin_build(_occ(spark, 0, 300), "key", W, D)
    )
    est = {r.key: r.est for r in sink.estimate(
        _occ(spark, 0, 300).select("key").distinct(), "key"
    ).collect()}
    true = {
        r.key: r.cnt
        for r in _occ(spark, 0, 300).groupBy("key").agg(
            F.count("*").alias("cnt")
        ).collect()
    }
    assert all(est[k] >= true[k] for k in true)


def test_redelivery_noop_despite_nonidempotent_sum(spark, tmp_path):
    sink = StreamingCountMin(spark, str(tmp_path / "cm"), W, D)
    batch = _occ(spark, 0, 50)
    sink.process_batch(batch, 0)
    before = _cells(sink.sketch_df())
    sink.process_batch(batch, 0)  # redelivered: must NOT double-count
    assert _cells(sink.sketch_df()) == before


def test_reopen_and_param_guard(spark, tmp_path):
    path = str(tmp_path / "cm")
    sink = StreamingCountMin(spark, path, W, D)
    sink.process_batch(_occ(spark, 0, 50), 0)
    reopened = StreamingCountMin(spark, path, W, D)
    assert _cells(reopened.sketch_df()) == _cells(sink.sketch_df())
    with pytest.raises(ValueError, match="built with"):
        StreamingCountMin(spark, path, W, D + 1)


def test_compact_preserves_sketch(spark, tmp_path):
    sink = StreamingCountMin(spark, str(tmp_path / "cm"), W, D)
    for i, (lo, hi) in enumerate([(0, 80), (80, 160), (160, 200)]):
        sink.process_batch(_occ(spark, lo, hi), i)
    before = _cells(sink.sketch_df())
    sink.compact()
    sink.vacuum()
    assert _cells(sink.sketch_df()) == before
    sink.process_batch(_occ(spark, 200, 220), 3)
    assert _cells(sink.sketch_df()) == _cells(
        countmin_build(_occ(spark, 0, 220), "key", W, D)
    )
