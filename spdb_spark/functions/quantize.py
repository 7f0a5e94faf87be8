"""Scalar (int8) embedding quantization — the storage/IO lever for
embedding tables at corpus scale: a 64-dim float64 vector is 512 bytes;
its symmetric int8 form is 64 bytes + one double scale (8x smaller
scans, shuffles, and broadcasts). Everything is Catalyst expressions —
quantization is a per-element HOF transform, scoring an integer fold —
and fully deterministic (sign-aware HALF_UP rounding, no RNG), so the
whole pipeline replays in the DuckDB oracle.

Scheme: per-vector symmetric linear quantization. scale = max|x| / 127;
q_d = round_half_up(x_d / scale) clamped to [-127, 127]. Cosine over
quantized vectors is scale-free (the scales cancel), so candidate
scoring never needs the original floats; an exact re-rank on the float
vectors (same bit-reproducible fold as similarity.py) restores exact
ordering within the candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spdb_spark.functions.similarity import _as_double


def _half_up(c):
    """Sign-aware HALF_UP rounding, portable across Spark and DuckDB
    (both engines' round() differ at .5 between dialects; floor(|x|+0.5)
    with the sign replicated is identical everywhere)."""
    return F.signum(c) * F.floor(F.abs(c) + 0.5)


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """-> (id, scale double, qvec array<tinyint>). Zero vectors get
    scale=0 and all-zero qvec (dequantizes back to zeros)."""
    base = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("_v")
    ).withColumn(
        "scale",
        F.aggregate(
            F.col("_v"), F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
        )
        / F.lit(127.0),
    )
    q = F.when(
        F.col("scale") == 0,
        F.transform(F.col("_v"), lambda x: F.lit(0.0)),
    ).otherwise(
        F.transform(
            F.col("_v"),
            lambda x: F.greatest(
                F.lit(-127.0), F.least(F.lit(127.0), _half_up(x / F.col("scale")))
            ),
        )
    )
    return base.withColumn("qvec", q.cast("array<tinyint>")).select(
        "vec_id", "scale", "qvec"
    )


def dequantize(qvec, scale):
    """array<tinyint>, double -> array<double> (q_d * scale)."""
    return F.transform(qvec, lambda x: x.cast("double") * scale)


def int_dot(a, b):
    """Integer dot product of two tinyint arrays as a long fold — the
    cheap scoring path (no float math until the final normalize)."""
    return F.aggregate(
        F.zip_with(a.cast("array<long>"), b.cast("array<long>"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    rerank: int = 30,
) -> DataFrame:
    """Two-stage exact-ish top-k: (1) score EVERY pair on int8 vectors —
    the shuffled/broadcast data is 1/8 the float size and the inner loop
    is integer multiply-adds; (2) exact float cosine re-rank of each
    query's `rerank` best quantized candidates (bit-identical fold to
    brute_force_topk). With rerank >= k the output ordering is exact
    whenever quantized ordering puts every true top-k inside the top
    `rerank` — the recall test pins that margin on the fixtures.
    Returns (query_id, neighbor_id, rank, cos_sim)."""
    from spdb_spark.functions.similarity import cosine_prenormed, norm

    cq = quantize_embeddings(corpus, id_col, vec_col).select(
        F.col("vec_id").alias("neighbor_id"), F.col("qvec").alias("c_q")
    )
    qq = quantize_embeddings(queries, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), F.col("qvec").alias("q_q")
    )
    # int8 cosine: scales cancel; norms computed on the int vectors
    scored_q = (
        cq.join(F.broadcast(qq))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                int_dot(F.col("c_q"), F.col("q_q")).cast("double")
                / (
                    F.sqrt(int_dot(F.col("c_q"), F.col("c_q")).cast("double"))
                    * F.sqrt(int_dot(F.col("q_q"), F.col("q_q")).cast("double"))
                )
            ).alias("q_sim"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("q_sim"), "neighbor_id")
    cands = (
        scored_q.withColumn("_qr", F.row_number().over(wq))
        .where(F.col("_qr") <= rerank)
        .select("query_id", "neighbor_id")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("_cn", norm(F.col("c_vec")))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
        ).withColumn("_qn", norm(F.col("q_vec")))
    )
    rescored = (
        cands.join(c, "neighbor_id")
        .join(q, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_prenormed(
                    F.col("q_vec"), F.col("c_vec"), F.col("_qn"), F.col("_cn")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
