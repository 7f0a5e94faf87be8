"""Streaming semantic dedup: pairs accumulated over micro-batches must
equal semantic_dedup_pairs on the union under the SAME frozen quantizer
(for any batch split), redelivery must be a no-op, and compaction must
preserve state."""

import pytest

from pyspark.sql import functions as F

from spdb_spark.functions.ivf import choose_centroids, semantic_dedup_pairs
from spdb_spark.streaming.semdedup import StreamingSemanticDedup
from tools.ann_recall import make_clustered

TAU = 0.92
CUTS = (120, 240)


@pytest.fixture(scope="module")
def vecs(spark):
    # clustered fixture: near-dup pairs actually exist at tau=0.92
    return make_clustered(spark, n=350, dim=64, n_clusters=10, noise=0.12).persist()


@pytest.fixture(scope="module")
def cents(spark, vecs):
    c = choose_centroids(vecs, "vec_id", "embedding", 8)
    return spark.createDataFrame(
        [(int(r.centroid_id), list(r.centroid_vec)) for r in c.collect()],
        schema="centroid_id int, centroid_vec array<double>",
    )


def _pairset(df):
    return {(r.id_a, r.id_b): r.cos_sim for r in df.collect()}


def _expected(vecs, cents):
    return _pairset(
        semantic_dedup_pairs(
            vecs, "vec_id", "embedding", tau=TAU, n_probe=3, cents=cents
        )
    )


def _batches(vecs):
    return [
        vecs.where(F.col("vec_id") < CUTS[0]),
        vecs.where((F.col("vec_id") >= CUTS[0]) & (F.col("vec_id") < CUTS[1])),
        vecs.where(F.col("vec_id") >= CUTS[1]),
    ]


def test_streaming_semdedup_matches_batch_pipeline(spark, vecs, cents, tmp_path):
    sink = StreamingSemanticDedup(
        spark, str(tmp_path / "sd"), cents, tau=TAU, n_probe=3
    )
    for i, b in enumerate(_batches(vecs)):
        sink.process_batch(b, i)

    expected = _expected(vecs, cents)
    got = _pairset(sink.pairs())
    assert got == expected
    assert len(got) > 0  # fixture does contain semantic near-dups
    # the union genuinely spans batches (cross-batch pairs found)
    cross = [r for r in sink.pairs().collect() if r.batch_id > 0]
    assert cross and all(r.id_a < r.id_b for r in sink.pairs().collect())

    # redelivery of an already-committed batch is a no-op
    sink.process_batch(_batches(vecs)[1], 1)
    assert _pairset(sink.pairs()) == expected


def test_streaming_semdedup_any_arrival_order(spark, vecs, cents, tmp_path):
    """Arrival order doesn't matter: reversed batches give the same
    pair set (bucket assignment is frozen-quantizer-only)."""
    sink = StreamingSemanticDedup(
        spark, str(tmp_path / "sd2"), cents, tau=TAU, n_probe=3
    )
    for i, b in enumerate(reversed(_batches(vecs))):
        sink.process_batch(b, i)
    assert _pairset(sink.pairs()) == _expected(vecs, cents)


def test_streaming_semdedup_compact_vacuum_preserve_pairs(
    spark, vecs, cents, tmp_path
):
    import os

    sink = StreamingSemanticDedup(
        spark, str(tmp_path / "sd3"), cents, tau=TAU, n_probe=3
    )
    batches = _batches(vecs)
    sink.process_batch(batches[0], 0)
    sink.process_batch(batches[1], 1)
    sink.compact()
    sink.vacuum()
    assert not os.path.exists(str(tmp_path / "sd3" / "pairs" / "b0"))
    # post-compaction arrivals still dedup against the compacted state
    sink.process_batch(batches[2], 2)
    assert _pairset(sink.pairs()) == _expected(vecs, cents)


def test_streaming_semdedup_end_to_end(spark, vecs, cents, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, b in enumerate(_batches(vecs)):
        b.coalesce(1).write.parquet(str(src / f"p{i}"))
    sink = StreamingSemanticDedup(
        spark, str(tmp_path / "sd4"), cents, tau=TAU, n_probe=3
    )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = sink.start(stream, str(tmp_path / "ckpt"), availableNow=True)
    try:
        assert q.awaitTermination(300)
    finally:
        q.stop()
    assert len(sink._committed()) >= 3
    assert _pairset(sink.pairs()) == _expected(vecs, cents)
