"""IVF (inverted-file) approximate nearest neighbor — the second scale path
for embedding search besides hyperplane LSH (functions/similarity.py).

Coarse quantizer: k centroids chosen deterministically from the corpus
(every (n/k)-th vector by id — reproducible without random state); each
vector is assigned to its nearest centroid (by dot product over normalized
vectors), forming inverted lists. A query scores only the lists of its
`n_probe` nearest centroids — compute proportional to n_probe/k of the
corpus. All stages are DataFrame ops; the centroid table broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spdb_spark.functions.similarity import _as_double, cosine


def choose_centroids(corpus: DataFrame, id_col: str, vec_col: str, k: int) -> DataFrame:
    """Deterministic coarse centroids: rank vectors by id, take every
    (n/k)-th. (K-means refinement would drop in here; selection is already
    a usable quantizer for ANN bucketing.)"""
    n = corpus.count()
    stride = max(n // k, 1)
    return (
        corpus.select(F.col(id_col).alias("cid_src"), F.col(vec_col).alias("c_vec"))
        .withColumn("rn", F.row_number().over(Window.orderBy("cid_src")))
        .where((F.col("rn") - 1) % stride == 0)
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("cid_src")) - 1).alias("centroid_id"),
            _as_double(F.col("c_vec")).alias("centroid_vec"),
        )
    )


def assign_lists(
    corpus: DataFrame, centroids: DataFrame, id_col: str, vec_col: str,
    n_probe: int = 1,
) -> DataFrame:
    """Attach the `n_probe` nearest centroid ids to each vector (n_probe=1
    builds the inverted lists; queries use n_probe>1 for recall)."""
    scored = (
        corpus.select(F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v"))
        .crossJoin(F.broadcast(centroids))
        .select(
            "vid", "v", "centroid_id",
            cosine(F.col("v"), F.col("centroid_vec")).alias("c_sim"),
        )
    )
    w = Window.partitionBy("vid").orderBy(F.desc("c_sim"), "centroid_id")
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= n_probe)
        .select("vid", "v", "centroid_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's n_probe
    nearest inverted lists, exact cosine re-rank within candidates.
    Returns (query_id, neighbor_id, rank, cos_sim)."""
    cents = choose_centroids(corpus, id_col, vec_col, n_centroids)
    lists = assign_lists(corpus, cents, id_col, vec_col, n_probe=1).select(
        F.col("vid").alias("neighbor_id"), F.col("v").alias("c_vec"), "centroid_id"
    )
    probes = assign_lists(queries, cents, id_col, vec_col, n_probe=n_probe).select(
        F.col("vid").alias("query_id"), F.col("v").alias("q_vec"), "centroid_id"
    )
    scored = (
        lists.join(F.broadcast(probes), "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
