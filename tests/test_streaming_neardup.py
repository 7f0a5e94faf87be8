"""Streaming near-dup: pairs accumulated over micro-batches must equal
the full batch MinHash-LSH pipeline on the union of all batches, and a
redelivered batch must not change the output (exactly-once)."""

from pyspark.sql import functions as F

from spdb_spark.functions.dedup import minhash_lsh_dedup
from spdb_spark.session import load_tables
from spdb_spark.streaming.neardup import StreamingNearDup

CUTS = (300, 600)  # three micro-batches: [0,300), [300,600), [600,..)


def _docs(spark):
    return load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ].select("doc_id", "text")


def _unordered(pairs):
    return {(min(a, b), max(a, b)): j for a, b, j in pairs}


def _expected(docs):
    full = minhash_lsh_dedup(docs, "doc_id", "text")
    return _unordered((r.id_a, r.id_b, r.jaccard) for r in full.collect())


def test_streaming_neardup_matches_batch_pipeline(spark, tmp_path):
    docs = _docs(spark)
    sink = StreamingNearDup(spark, str(tmp_path / "nd"))

    batches = [
        docs.where(F.col("doc_id") < CUTS[0]),
        docs.where((F.col("doc_id") >= CUTS[0]) & (F.col("doc_id") < CUTS[1])),
        docs.where(F.col("doc_id") >= CUTS[1]),
    ]
    for i, b in enumerate(batches):
        sink.process_batch(b, i)

    got = _unordered(
        (r.id_a, r.id_b, r.jaccard) for r in sink.pairs().collect()
    )
    expected = _expected(docs)
    assert got == expected
    assert len(got) > 0  # fixture corpus does contain near-dups

    # cross-batch pairs keep (earlier corpus doc, new doc) orientation
    cross = [
        r
        for r in sink.pairs().collect()
        if not (r.id_a < CUTS[0] and r.id_b < CUTS[0]) and r.batch_id > 0
    ]
    assert all(r.id_a < r.id_b for r in cross)

    # redelivery of an already-committed batch is a no-op
    sink.process_batch(batches[1], 1)
    again = _unordered((r.id_a, r.id_b, r.jaccard) for r in sink.pairs().collect())
    assert again == expected


def test_streaming_neardup_end_to_end(spark, tmp_path):
    docs = _docs(spark)
    src = tmp_path / "src"
    src.mkdir()
    # two source files -> maxFilesPerTrigger=1 forces two micro-batches
    docs.where(F.col("doc_id") < CUTS[0]).coalesce(1).write.parquet(
        str(src / "p0")
    )
    docs.where(F.col("doc_id") >= CUTS[0]).coalesce(1).write.parquet(
        str(src / "p1")
    )

    sink = StreamingNearDup(spark, str(tmp_path / "nd"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = sink.start(stream, str(tmp_path / "ckpt"), availableNow=True)
    q.awaitTermination(300)

    assert len(sink._committed()) >= 2  # genuinely incremental, not one batch
    got = _unordered((r.id_a, r.id_b, r.jaccard) for r in sink.pairs().collect())
    assert got == _expected(docs)


def test_neardup_compact_and_vacuum_preserve_pairs(spark, tmp_path):
    import os

    base = str(tmp_path / "ndc")
    docs = _docs(spark)
    sink = StreamingNearDup(spark, base)
    sink.process_batch(docs.where(F.col("doc_id") < CUTS[0]), 0)
    sink.process_batch(
        docs.where((F.col("doc_id") >= CUTS[0]) & (F.col("doc_id") < CUTS[1])), 1
    )
    before = _unordered((r.id_a, r.id_b, r.jaccard) for r in sink.pairs().collect())

    sink.compact()
    sink.vacuum()
    assert (
        _unordered((r.id_a, r.id_b, r.jaccard) for r in sink.pairs().collect())
        == before
    )
    assert not os.path.exists(os.path.join(base, "bands", "b0"))
    assert os.path.exists(os.path.join(base, "bands", "g0"))

    # later batches probe the compacted band index: totals equal the full
    # batch pipeline on the union
    sink.process_batch(docs.where(F.col("doc_id") >= CUTS[1]), 2)
    got = _unordered((r.id_a, r.id_b, r.jaccard) for r in sink.pairs().collect())
    assert got == _expected(docs)
