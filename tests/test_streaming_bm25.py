"""Streaming BM25 index maintenance: micro-batched index growth must
equal a full rebuild, a redelivered batch must be a no-op, and a crash
mid-append must converge on the Structured-Streaming-style retry with
the same batch id."""

import shutil as _shutil

from pyspark.sql import functions as F

from spdb_spark.functions.retrieval import bm25_search_indexed, save_bm25_index
from spdb_spark.session import load_tables
from spdb_spark.streaming.bm25 import StreamingBM25Index

TERMS = ("scan", "merge", "stream")


def _docs(spark):
    return load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ].select("doc_id", "text")


def _scores(df):
    return {r.doc_id: r.score for r in df.collect()}


def test_streamed_index_equals_full_rebuild(spark, tmp_path):
    docs = _docs(spark)
    sink = StreamingBM25Index(spark, str(tmp_path / "sidx"))
    batches = [
        docs.where(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    for i, b in enumerate(batches):
        sink.process_batch(b, i)

    full = str(tmp_path / "full")
    save_bm25_index(docs, "doc_id", "text", full)
    assert _scores(sink.search(TERMS)) == _scores(
        bm25_search_indexed(spark, full, TERMS)
    )


def test_redelivered_batch_is_noop(spark, tmp_path):
    docs = _docs(spark)
    sink = StreamingBM25Index(spark, str(tmp_path / "sidx2"))
    b0 = docs.where(F.col("doc_id") < 300)
    b1 = docs.where(F.col("doc_id") >= 300)
    sink.process_batch(b0, 0)
    sink.process_batch(b1, 1)
    before = _scores(sink.search(TERMS))
    # Structured Streaming redelivers with the SAME batch id after a
    # sink failure — must not double-count postings
    sink.process_batch(b1, 1)
    sink.process_batch(b0, 0)
    assert _scores(sink.search(TERMS)) == before


def test_crash_mid_append_converges_on_retry(spark, tmp_path, monkeypatch):
    docs = _docs(spark)
    sink = StreamingBM25Index(spark, str(tmp_path / "sidx3"))
    b0 = docs.where(F.col("doc_id") < 300)
    b1 = docs.where(F.col("doc_id") >= 300)
    sink.process_batch(b0, 0)

    real_copytree = _shutil.copytree
    calls = {"n": 0}

    def crashing(src, dst, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected crash mid-publish")
        return real_copytree(src, dst, **kw)

    monkeypatch.setattr(_shutil, "copytree", crashing)
    try:
        sink.process_batch(b1, 1)
        raised = False
    except OSError:
        raised = True
    assert raised
    # retry with the same batch id (what the streaming engine does)
    sink.process_batch(b1, 1)

    full = str(tmp_path / "full3")
    save_bm25_index(docs, "doc_id", "text", full)
    assert _scores(sink.search(TERMS)) == _scores(
        bm25_search_indexed(spark, full, TERMS)
    )


def test_readstream_drive_end_to_end(spark, tmp_path):
    """Real Structured Streaming drive: readStream -> foreachBatch append
    -> search equals a batch rebuild of the same corpus."""
    docs = _docs(spark).limit(200)
    src = str(tmp_path / "src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    sink = StreamingBM25Index(spark, str(tmp_path / "sidx4"))
    q = sink.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    full = str(tmp_path / "full4")
    save_bm25_index(docs, "doc_id", "text", full)
    assert _scores(sink.search(TERMS)) == _scores(
        bm25_search_indexed(spark, full, TERMS)
    )
