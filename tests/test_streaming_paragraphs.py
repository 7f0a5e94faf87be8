"""Streaming paragraph dedup: cleaned docs accumulated over micro-batches
must equal the batch paragraph_dedup pipeline on the union (for the
default min_df=2 and doc-ordered batches), a paragraph seen in an earlier
batch must vanish from later docs, and a redelivered batch must be a
no-op (exactly-once)."""

import os

from pyspark.sql import functions as F

from spdb_spark.functions import dedup as D
from spdb_spark.session import load_tables
from spdb_spark.streaming.paragraphs import StreamingParagraphDedup

CUTS = (300, 600)
CHUNK = 3


def _docs(spark):
    return load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ].select("doc_id", "text")


def _batch_expected(docs):
    paras = D.word_chunk_paragraphs(docs, "doc_id", "text", CHUNK)
    kept = D.paragraph_dedup(paras, min_df=2)
    return {
        r.doc: (r.clean_text, r.n_paras, r.n_kept)
        for r in D.reassemble_paragraph_docs(paras, kept).collect()
    }


def test_streaming_paragraph_dedup_matches_batch_pipeline(spark, tmp_path):
    docs = _docs(spark)
    sink = StreamingParagraphDedup(
        spark, str(tmp_path / "pd"), chunk_words=CHUNK
    )
    batches = [
        docs.where(F.col("doc_id") < CUTS[0]),
        docs.where((F.col("doc_id") >= CUTS[0]) & (F.col("doc_id") < CUTS[1])),
        docs.where(F.col("doc_id") >= CUTS[1]),
    ]
    for i, b in enumerate(batches):
        sink.process_batch(b, i)

    got = {
        r.doc: (r.clean_text, r.n_paras, r.n_kept) for r in sink.docs().collect()
    }
    expected = _batch_expected(docs)
    assert got == expected
    # the fixture really exercises cross-batch drops
    assert any(v[2] < v[1] for v in got.values())


def test_cross_batch_paragraph_dropped_and_replay_noop(spark, tmp_path):
    sink = StreamingParagraphDedup(spark, str(tmp_path / "pd2"))  # '\n\n' units
    b0 = spark.createDataFrame(
        [(1, "alpha\n\nBOILER\n\nbeta")], "doc_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(2, "BOILER\n\ngamma")], "doc_id long, text string"
    )
    sink.process_batch(b0, 0)
    sink.process_batch(b1, 1)
    out = {r.doc: r for r in sink.docs().collect()}
    assert out[1].clean_text == "alpha BOILER beta"  # canonical copy kept
    assert out[2].clean_text == "gamma"
    assert (out[2].n_paras, out[2].n_kept) == (2, 1)

    # redelivery of batch 1 must not change anything (ledger skip)
    before = sorted(
        (r.doc, r.clean_text, r.n_paras, r.n_kept) for r in sink.docs().collect()
    )
    sink.process_batch(b1, 1)
    after = sorted(
        (r.doc, r.clean_text, r.n_paras, r.n_kept) for r in sink.docs().collect()
    )
    assert before == after

    # the index stays dup-free: BOILER's hash lives in batch 0's slice only
    ph0 = spark.read.parquet(os.path.join(str(tmp_path / "pd2"), "phashes", "b0"))
    ph1 = spark.read.parquet(os.path.join(str(tmp_path / "pd2"), "phashes", "b1"))
    assert ph0.intersect(ph1).count() == 0


def test_streaming_entrypoint_available_now(spark, tmp_path):
    docs = _docs(spark).limit(50)
    src_dir = str(tmp_path / "src")
    docs.write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(docs.schema).parquet(src_dir)
    sink = StreamingParagraphDedup(
        spark, str(tmp_path / "pd3"), chunk_words=CHUNK
    )
    q = sink.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert sink.docs().count() == 50


def test_compact_and_vacuum_preserve_state_and_future_batches(spark, tmp_path):
    base = str(tmp_path / "pd4")
    sink = StreamingParagraphDedup(spark, base, chunk_words=CHUNK)
    docs = _docs(spark)
    sink.process_batch(docs.where(F.col("doc_id") < CUTS[0]), 0)
    sink.process_batch(
        docs.where((F.col("doc_id") >= CUTS[0]) & (F.col("doc_id") < CUTS[1])), 1
    )
    before = sorted(map(tuple, sink.docs().collect()))

    sink.compact()
    assert sorted(map(tuple, sink.docs().collect())) == before
    sink.vacuum()
    assert sorted(map(tuple, sink.docs().collect())) == before
    # batch dirs under the watermark are gone, one generation dir remains
    assert not os.path.exists(os.path.join(base, "docs", "b0"))
    assert os.path.exists(os.path.join(base, "docs", "g0"))

    # post-compaction batches still dedup against the compacted index
    # AND the streaming total still equals the batch pipeline
    sink.process_batch(docs.where(F.col("doc_id") >= CUTS[1]), 2)
    got = {
        r.doc: (r.clean_text, r.n_paras, r.n_kept) for r in sink.docs().collect()
    }
    assert got == _batch_expected(docs)

    # a second compact generation also round-trips
    sink.compact()
    sink.vacuum()
    assert {
        r.doc: (r.clean_text, r.n_paras, r.n_kept) for r in sink.docs().collect()
    } == _batch_expected(docs)

    # replay of a pre-compaction batch id is still a no-op
    sink.process_batch(docs.where(F.col("doc_id") < CUTS[0]), 0)
    assert {
        r.doc: (r.clean_text, r.n_paras, r.n_kept) for r in sink.docs().collect()
    } == _batch_expected(docs)


def test_crash_mid_compact_leaves_state_readable_and_retry_succeeds(
    spark, tmp_path, monkeypatch
):
    """A crash AFTER the generation dirs are written but BEFORE
    _compact.json swings must leave readers on the old layout (state
    unchanged), and a retried compact() must fully recover."""
    import json

    base = str(tmp_path / "pdc")
    sink = StreamingParagraphDedup(spark, base, chunk_words=CHUNK)
    docs = _docs(spark)
    sink.process_batch(docs.where(F.col("doc_id") < CUTS[0]), 0)
    sink.process_batch(docs.where(F.col("doc_id") >= CUTS[0]), 1)
    before = sorted(map(tuple, sink.docs().collect()))

    real_rename = os.rename

    def exploding_rename(src, dst):
        if dst.endswith("_compact.json"):
            raise OSError("simulated crash before publish")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", exploding_rename)
    try:
        sink.compact()
    except OSError:
        pass
    monkeypatch.undo()

    # not published: readers still see the batch-dir layout, unchanged
    assert sink._compact_info() is None
    assert sorted(map(tuple, sink.docs().collect())) == before

    # retry succeeds and the orphan generation dir is superseded
    sink.compact()
    sink.vacuum()
    assert sorted(map(tuple, sink.docs().collect())) == before
    info = json.load(open(os.path.join(base, "_compact.json")))
    assert os.path.exists(os.path.join(base, "docs", f"g{info['gen']}"))
