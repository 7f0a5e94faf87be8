"""Embedding similarity search: brute-force cosine top-k (baseline) and a
deterministic random-hyperplane LSH bucketed variant (the scale path).

Dot products run as F.aggregate over zipped double arrays — index-order
left-to-right summation, bitwise-reproducible and identical to the DuckDB
oracle's list_dot_product. Broadcast the query side; the corpus never
shuffles for brute force. The LSH variant buckets the corpus once (16-bit
signature) and only scores within matching buckets — at 100TB the bucket
table is the index.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def _as_double(c: Column) -> Column:
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    # The HOF fold is the measured-fastest JVM-side form: an unrolled
    # 64-term getItem chain was tried and ran 3x SLOWER (the huge generated
    # method falls out of JIT/whole-stage codegen into interpreted eval).
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """Cosine with the per-vector norms hoisted out of the pair loop.

    In an N x M pair scoring, `cosine` re-folds each vector's norm once
    per PAIR (2*N*M folds); materializing norms in the projections before
    the join makes it N+M folds and one multiply-add per pair. The norm
    fold order is unchanged, so scores stay bit-identical."""
    return dot(a, b) / (a_norm * b_norm)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x corpus, per-query rank.
    Deterministic ordering: (rounded score desc, neighbor id asc).
    Returns (query_id, neighbor_id, rank, cos_sim)."""
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
        ).withColumn("q_norm", norm(F.col("q_vec")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("c_norm", norm(F.col("c_vec")))
    scored = (
        c.crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_prenormed(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
                ),
                6,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component weights in [-1, 1):
    derived from the portable md5-hash so Spark and any oracle agree."""
    # materialized driver-side (tiny) — same arithmetic as hyperplane_col
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{plane}:{d}".encode()).hexdigest()[:15], 16)
        out.append(((h % 2001) - 1000) / 1000.0)
    return out


def lsh_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane signature: bit p = [dot(vec, plane_p) > 0]."""
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        w = F.array(*[F.lit(c) for c in hyperplane(dim, p)])
        sig = sig + F.when(
            dot(_as_double(vec), w) > 0, F.shiftleft(F.lit(1).cast("long"), p)
        ).otherwise(F.lit(0).cast("long"))
    return sig


def lsh_signatures(vec: Column, dim: int, n_planes: int, n_tables: int) -> Column:
    """Array of per-table hyperplane signatures (table l uses planes
    l*n_planes .. (l+1)*n_planes-1)."""
    sigs = []
    for table in range(n_tables):
        sig = F.lit(0).cast("long")
        for p in range(n_planes):
            w = F.array(*[F.lit(c) for c in hyperplane(dim, table * n_planes + p)])
            sig = sig + F.when(
                dot(_as_double(vec), w) > 0, F.shiftleft(F.lit(1).cast("long"), p)
            ).otherwise(F.lit(0).cast("long"))
        sigs.append(F.struct(F.lit(table).alias("tbl"), sig.alias("sig")))
    return F.array(*sigs)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k with multi-table hyperplane LSH: candidates share a
    full signature in ANY of `n_tables` independent tables (OR-construction
    — recall 1-(1-q^r)^L), then exact cosine re-rank within candidates.
    n_planes trades candidate-set size against recall per table."""
    from pyspark.sql import Window

    sig = lambda v: F.explode(lsh_signatures(v, dim, n_planes, n_tables))  # noqa: E731
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("c_vec"),
        sig(F.col(vec_col)).alias("b"),
    ).select("neighbor_id", "c_vec", "b.tbl", "b.sig").withColumn(
        "_cn", norm(F.col("c_vec"))
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            _as_double(F.col(vec_col)).alias("q_vec"),
            sig(F.col(vec_col)).alias("b"),
        ).select("query_id", "q_vec", "b.tbl", "b.sig").withColumn(
            "_qn", norm(F.col("q_vec"))
        )
    )
    # score first, dedup the 3-scalar rows after: a candidate surfaced by
    # several tables scores identically in each, and deduping before
    # scoring would shuffle both 64-dim vectors per candidate (the
    # measured bottleneck shape in the IVF path)
    scored = (
        c.join(q, ["tbl", "sig"])
        .where(F.col("neighbor_id") != F.col("query_id"))
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
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def knn_classify(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 10,
    neighbors: DataFrame | None = None,
) -> DataFrame:
    """Majority-vote kNN classification over an embedding column:
    (query_id, pred_label, votes) — the label most frequent among the
    query's k nearest corpus vectors, ties broken toward the smallest
    label (deterministic).

    By default neighbors come from `brute_force_topk` (the exact
    baseline the oracle replays); at corpus scale pass `neighbors` from
    `ivf.ivf_topk`/`ivf_topk_indexed` — any (query_id, neighbor_id)
    table with the same contract drops in, making this the standard
    label-propagation / weak-labeling consumer of the ANN stack. The
    vote is one count aggregate plus a row_number argmax ordered
    (votes DESC, label ASC) — type-agnostic, so string labels tie-break
    correctly too (the earlier struct-max form negated the label, which
    silently null-casts non-numeric labels and made ties
    nondeterministic)."""
    from pyspark.sql import Window

    nn = (
        neighbors
        if neighbors is not None
        else brute_force_topk(corpus, queries, id_col, vec_col, k=k)
    )
    labels = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nbr_label")
    )
    votes = (
        nn.join(labels, "neighbor_id")
        .groupBy("query_id", "nbr_label")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("nbr_label").asc()
    )
    return (
        votes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "query_id",
            F.col("nbr_label").alias("pred_label"),
            F.col("votes"),
        )
    )
