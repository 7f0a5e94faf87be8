"""Streaming vector index: appending micro-batches under the frozen
quantizer must leave an index bit-identical to a batch rebuild with the
same quantizer (stream == batch topk pin), redelivery must be a no-op,
and the real readStream path must commit genuinely incremental batches."""

import pytest

from pyspark.sql import functions as F

from spdb_spark.streaming.vectorindex import StreamingVectorIndex
from tools.ann_recall import make_clustered

CUTS = (150, 250)  # bootstrap [0,150), then two append batches


@pytest.fixture(scope="module")
def vecs(spark):
    return make_clustered(spark, n=350, dim=64, n_clusters=12, noise=0.3).persist()


@pytest.fixture(scope="module")
def boot_ivfpq(spark, vecs, tmp_path_factory):
    """Bootstrapped ivfpq index dir (vec_id < CUTS[0]) built ONCE —
    bootstrapping trains the quantizer (centroids + residual codebooks),
    the expensive part of every test here; tests copy the directory
    (milliseconds) and reopen it instead of retraining."""
    path = str(tmp_path_factory.mktemp("svi") / "boot")
    StreamingVectorIndex(
        spark, path, kind="ivfpq", dim=64,
        bootstrap=vecs.where(F.col("vec_id") < CUTS[0]),
    )
    return path


def _copy_idx(src_path, tmp_path):
    import shutil

    dst = str(tmp_path / "idx")
    shutil.copytree(src_path, dst)
    return dst


def _topk(df):
    return sorted(map(tuple, df.collect()))


def test_streaming_ivfpq_matches_batch_rebuild(spark, vecs, boot_ivfpq, tmp_path):
    from spdb_spark.functions.pq import save_ivfpq_index

    sink = StreamingVectorIndex(spark, _copy_idx(boot_ivfpq, tmp_path), kind="ivfpq", dim=64)
    sink.process_batch(
        vecs.where((F.col("vec_id") >= CUTS[0]) & (F.col("vec_id") < CUTS[1])), 0
    )
    sink.process_batch(vecs.where(F.col("vec_id") >= CUTS[1]), 1)

    # batch rebuild with the SAME frozen quantizer (read off the index)
    cents = spark.read.parquet(str(tmp_path / "idx" / "centroids"))
    cb_rows = spark.read.parquet(
        str(tmp_path / "idx" / "pq_codebooks")
    ).collect()
    m = 1 + max(r["subspace"] for r in cb_rows)
    cbs = [[] for _ in range(m)]
    for r in cb_rows:
        cbs[r["subspace"]].append((int(r["pq_id"]), list(r["sub_vec"])))
    for cb in cbs:
        cb.sort()
    save_ivfpq_index(
        vecs, str(tmp_path / "full"), dim=64, cents=cents, codebooks=cbs
    )

    q = vecs.where(F.col("vec_id") % 70 == 0)
    got = _topk(sink.topk(q, vecs, k=5, rerank=40))
    from spdb_spark.functions.pq import ivfpq_topk_indexed

    want = _topk(
        ivfpq_topk_indexed(spark, str(tmp_path / "full"), q, vecs, dim=64,
                           k=5, rerank=40)
    )
    assert got == want and len(got) > 0

    # appended vectors are reachable (not just indexed)
    neighbors = {r.neighbor_id for r in sink.topk(q, vecs, k=5, rerank=40).collect()}
    assert any(n >= CUTS[0] for n in neighbors)

    # redelivery of a committed batch id is a no-op
    sink.process_batch(vecs.where(F.col("vec_id") >= CUTS[1]), 1)
    assert _topk(sink.topk(q, vecs, k=5, rerank=40)) == want

    # compaction + vacuum keep results
    sink.compact()
    sink.vacuum()
    assert _topk(sink.topk(q, vecs, k=5, rerank=40)) == want


def test_streaming_ivf_matches_batch_rebuild(spark, vecs, tmp_path):
    from spdb_spark.functions.ivf import ivf_topk_indexed, save_index

    boot = vecs.where(F.col("vec_id") < CUTS[0])
    sink = StreamingVectorIndex(
        spark, str(tmp_path / "idx"), kind="ivf", bootstrap=boot
    )
    sink.process_batch(vecs.where(F.col("vec_id") >= CUTS[0]), 0)
    # redelivery no-op (the staged batch_id path on ivf.append_to_index)
    sink.process_batch(vecs.where(F.col("vec_id") >= CUTS[0]), 0)

    cents = spark.read.parquet(str(tmp_path / "idx" / "centroids"))
    # rebuild = assign the union against the same frozen centroids
    from spdb_spark.functions.ivf import assign_lists

    full = str(tmp_path / "full")
    cents.write.parquet(full + "/centroids")
    assign_lists(vecs, cents, "vec_id", "embedding", n_probe=1).select(
        "vid", "v", "centroid_id"
    ).write.partitionBy("centroid_id").parquet(full + "/lists")

    q = vecs.where(F.col("vec_id") % 70 == 0)
    got = _topk(sink.topk(q, k=5))
    want = _topk(ivf_topk_indexed(spark, full, q, k=5))
    assert got == want and len(got) > 0


def test_streaming_vectorindex_end_to_end(spark, vecs, boot_ivfpq, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    vecs.where(
        (F.col("vec_id") >= CUTS[0]) & (F.col("vec_id") < CUTS[1])
    ).coalesce(1).write.parquet(str(src / "p0"))
    vecs.where(F.col("vec_id") >= CUTS[1]).coalesce(1).write.parquet(
        str(src / "p1")
    )
    sink = StreamingVectorIndex(
        spark, _copy_idx(boot_ivfpq, tmp_path), kind="ivfpq", dim=64
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
    import os

    markers = os.listdir(str(tmp_path / "idx" / "_appendlog"))
    assert len(markers) >= 2  # genuinely incremental, not one batch
    queries = vecs.where(F.col("vec_id") % 70 == 0)
    res = sink.topk(queries, vecs, k=5, rerank=40)
    neighbors = {r.neighbor_id for r in res.collect()}
    assert any(n >= CUTS[0] for n in neighbors)


def test_streaming_vectorindex_requires_trained_quantizer(spark, tmp_path):
    with pytest.raises(ValueError, match="quantizer must be trained"):
        StreamingVectorIndex(spark, str(tmp_path / "none"), kind="ivfpq")
