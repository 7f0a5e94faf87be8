"""int8 embedding quantization: error bounds, degenerate vectors, and the
two-stage quantized top-k against the exact brute-force baseline."""

import numpy as np
from pyspark.sql import functions as F

from spdb_spark.functions.quantize import (
    dequantize,
    quantize_embeddings,
    quantized_topk,
)
from spdb_spark.functions.similarity import brute_force_topk
from spdb_spark.session import load_tables

SF = "/root/testdata/sf0.001"


def _embs(spark):
    return load_tables(spark, SF, names=("embeddings",))["embeddings"]


def test_roundtrip_error_within_half_step(spark):
    """|x - dequant(quant(x))| <= scale/2 per element (symmetric linear
    quantization's guarantee), and qvec values stay in [-127, 127]."""
    q = quantize_embeddings(_embs(spark))
    joined = (
        _embs(spark)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .join(q, "vec_id")
        .select(
            "vec_id",
            "scale",
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    dequantize(F.col("qvec"), F.col("scale")),
                    lambda x, y: F.abs(x - y),
                ),
                F.lit(0.0),
                lambda acc, e: F.greatest(acc, e),
            ).alias("max_err"),
            F.array_max(F.col("qvec").cast("array<int>")).alias("qmax"),
            F.array_min(F.col("qvec").cast("array<int>")).alias("qmin"),
        )
    )
    rows = joined.collect()
    assert rows
    for r in rows:
        assert r.max_err <= r.scale / 2 + 1e-12
        assert -127 <= r.qmin and r.qmax <= 127


def test_zero_vector_roundtrips_to_zeros(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 8), (2, [1.0, -2.0] + [0.0] * 6)],
        "vec_id long, embedding array<double>",
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert rows[1].scale == 0.0
    assert list(rows[1].qvec) == [0] * 8
    assert rows[2].qvec[1] == -127  # max-magnitude element saturates


def test_quantized_topk_matches_exact_with_rerank_margin(spark):
    """With a rerank margin the two-stage result equals brute force
    exactly on the fixtures (int8 ordering keeps every true top-k in
    the candidate set)."""
    embs = _embs(spark)
    queries = embs.where(F.col("vec_id") % 37 == 0)
    want = {
        (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
        for r in brute_force_topk(embs, queries, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id, r.rank, r.cos_sim)
        for r in quantized_topk(embs, queries, k=5, rerank=40).collect()
    }
    assert got == want


def test_quantized_vectors_are_eight_times_smaller(spark, tmp_path):
    """The point of the op: the persisted quantized table is a fraction
    of the float table's size (tinyint array + one double vs double
    array)."""
    import os

    embs = _embs(spark).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    fdir, qdir = str(tmp_path / "f"), str(tmp_path / "q")
    embs.write.parquet(fdir)
    quantize_embeddings(embs).write.parquet(qdir)

    def sz(d):
        return sum(
            os.path.getsize(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    assert sz(qdir) < sz(fdir) / 3  # conservative: parquet encodings vary
