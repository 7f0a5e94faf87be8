"""Streaming DSIR scoring: the stateless LUT kernel must reproduce the
batch scorer's weights on the same documents, on both a batch frame and
a real stream (file source, availableNow)."""

import pytest

from spdb_spark.functions.dsir import dsir_bucket_logratio, dsir_weights
from spdb_spark.streaming.dsir import dsir_logratio_lut, dsir_score_stream

B = 128

RAW = [
    (0, "the cat sat on the mat"),
    (1, "stock market prices fell sharply today"),
    (2, "the dog sat on the rug"),
    (3, "buy cheap pills online now"),
    (4, "the cat and the dog sat"),
    (5, "market prices rose in early trading"),
    (6, ""),  # empty text: [''] pseudo-token, scores like batch
]
TARGET = [(100, "the cat sat"), (101, "the dog sat on the mat")]
SCHEMA = "doc_id long, text string"


@pytest.fixture(scope="module")
def fitted(spark):
    raw = spark.createDataFrame(RAW, SCHEMA)
    tgt = spark.createDataFrame(TARGET, SCHEMA)
    lr = dsir_bucket_logratio(raw, tgt, n_buckets=B)
    batch = {
        r["doc_id"]: (r["log_weight"], r["n_grams"])
        for r in dsir_weights(raw, lr, n_buckets=B).collect()
    }
    return dsir_logratio_lut(lr, B), batch


def _check(batch, got):
    # the batch scorer's inner join drops docs with zero matched grams;
    # the stream emits them with n_grams=0 — compare the scored set
    scored = {i: v for i, v in got.items() if v[1] > 0}
    assert set(scored) == set(batch)
    for i in batch:
        assert scored[i][1] == batch[i][1], i
        assert scored[i][0] == pytest.approx(batch[i][0], rel=1e-12), i


def test_kernel_matches_batch_scorer(spark, fitted):
    lut, batch = fitted
    raw = spark.createDataFrame(RAW, SCHEMA)
    got = {
        r["doc_id"]: (r["log_weight"], r["n_grams"])
        for r in dsir_score_stream(raw, lut, B).collect()
    }
    assert len(got) == len(RAW)  # no rows dropped, even zero-gram docs
    _check(batch, got)


def test_stream_matches_batch_scorer(spark, fitted, tmp_path):
    lut, batch = fitted
    src = tmp_path / "dsir_src"
    src.mkdir()
    df = spark.createDataFrame(RAW, SCHEMA)
    df.coalesce(1).write.parquet(str(src / "p1"))

    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    q = (
        dsir_score_stream(stream, lut, B)
        .writeStream.format("memory")
        .queryName("dsir_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["log_weight"], r["n_grams"])
        for r in spark.sql("SELECT * FROM dsir_out").collect()
    }
    assert len(got) == len(RAW)
    _check(batch, got)
