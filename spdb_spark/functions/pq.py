"""Product quantization (PQ) with asymmetric-distance (ADC) scoring —
the classic memory/IO lever for billion-vector ANN (Jegou et al. 2011,
public method): split each vector into `m` subspaces, quantize each
subvector to one of `n_codes` per-subspace centroids, and score a query
against CODES ONLY via a per-query lookup table of subspace distances.

Storage: dim float64 (8*dim bytes) -> m uint8 codes (m bytes): 64x
smaller than floats at dim=64/m=8, 8x smaller than the SQ8 path
(quantize.py). Scan/shuffle/broadcast volume shrinks by the same
factor — at 100 TB of embeddings the code table is what a full-scan
candidate stage reads, and the float vectors are touched only for the
exact re-rank of each query's `rerank` best candidates.

Spark-first shape, mirroring ivf.py/quantize.py:
- the codebook is k rows per subspace, collected once (driver-trivial,
  like ivf_topk's centroid pick) and inlined as plan literals, so
  ENCODING is a pure zero-exchange projection: per subspace an
  array_min over (rounded-d2, centroid_id) structs — argmin with the
  portable tie-break, no join, no UDF;
- ADC scoring broadcasts the (tiny) query side carrying a precomputed
  LUT column (m x n_codes rounded subspace distances) and folds
  zip_with(codes, lut) — the corpus side ships m small ints per vector;
- the exact re-rank is the same bit-reproducible cosine fold the other
  ANN paths share, so output ordering follows the common protocol
  (rounded score desc, neighbor_id asc).

Determinism protocol (replayed by the DuckDB gate oracle): centroids
are the md5-pick of ivf.choose_centroids (bit-stable; k-means
refinement is a documented non-bit-stable option there); every
subspace distance is the DOT-PRODUCT EXPANSION |s|^2 - 2 s.c + |c|^2
over the engines' proven-identical left-to-right dot folds, rounded to
6dp BEFORE argmin/summation; rounded terms are multiples of 1e-6, so
their sums round identically in any summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spdb_spark.functions.similarity import _as_double, cosine_prenormed, dot, norm


def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
) -> list[list[tuple[int, list[float]]]]:
    """Train (deterministically pick) the per-subspace codebooks:
    subspace j's codebook is the j-th slice of the `n_codes`
    md5-smallest-hash corpus vectors (ivf.choose_centroids — TakeOrdered,
    one scan, no global sort). Returns driver-side
    [subspace][(centroid_id, subvector)] for inlining as plan literals
    (m * n_codes * dim/m doubles — bytes, not data)."""
    from spdb_spark.functions.ivf import choose_centroids

    if dim % m:
        raise ValueError("pq: dim must divide into m equal subspaces")
    d_sub = dim // m
    rows = choose_centroids(corpus, id_col, vec_col, n_codes).collect()
    return [
        [
            (int(r.centroid_id), [float(x) for x in r.centroid_vec[j * d_sub : (j + 1) * d_sub]])
            for r in rows
        ]
        for j in range(m)
    ]


def refine_pq_codebooks(
    corpus: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
) -> list[list[tuple[int, list[float]]]]:
    """Per-subspace Lloyd k-means over the md5-picked init — the
    standard PQ training step. ONE aggregate per iteration for ALL
    subspaces: each vector explodes to its m (subspace, code, subvector)
    assignments, a (j, code, pos) groupBy averages components (map-side
    partials; the shuffle carries m * n_codes * d_sub cells), and the
    m*k*d_sub means are collected (driver-trivial) into the next
    codebook. A code whose cell goes empty keeps its old centroid.

    At 100 TB pass a `corpus.sample(...)` — quantizer quality needs a
    representative sample, not the corpus (same posture as
    ivf.refine_centroids). Float caveat as there: groupBy-avg is
    summation-order nondeterministic, so refined codebooks are not
    bit-reproducible across runs — gates pin the UNREFINED pick."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0][1])
    v = _as_double(F.col(vec_col))
    for _ in range(iters):
        per_j = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    _code_expr(v, codebooks, j, d_sub).alias("code"),
                    F.slice(v, j * d_sub + 1, d_sub).alias("sv"),
                )
                for j in range(m)
            ]
        )
        means = (
            corpus.select(F.explode(per_j).alias("p"))
            .select("p.j", "p.code", F.posexplode("p.sv").alias("pos", "val"))
            .groupBy("j", "code", "pos")
            .agg(F.avg("val").alias("mu"))
            .collect()
        )
        cells: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            cells.setdefault((r["j"], r["code"]), {})[r["pos"]] = r["mu"]
        codebooks = [
            [
                (
                    cid,
                    [
                        cells[(j, cid)][p]
                        for p in range(d_sub)
                    ]
                    if (j, cid) in cells
                    else c_vec,
                )
                for cid, c_vec in codebooks[j]
            ]
            for j in range(m)
        ]
    return codebooks


def _d2_expr(sub, s_self, c_vec: list[float]):
    """Rounded squared L2 distance of a subvector Column to a literal
    centroid, via the dot expansion (both engines' dot folds are
    identical left-to-right; rounding to 6dp before any comparison or
    sum makes downstream arithmetic order-free)."""
    c = F.array(*[F.lit(x) for x in c_vec])
    c_self = sum(x * x for x in c_vec)
    return F.round(s_self - 2.0 * dot(sub, c) + F.lit(c_self), 6)


def _code_expr(vec, codebooks, j: int, d_sub: int):
    """argmin centroid id for subspace j — array_min over
    (distance, centroid_id) structs: rounded-distance asc, id asc."""
    sub = F.slice(vec, j * d_sub + 1, d_sub)
    s_self = dot(sub, sub)
    return F.array_min(
        F.array(
            *[
                F.struct(
                    _d2_expr(sub, s_self, c_vec).alias("d"),
                    F.lit(cid).alias("i"),
                )
                for cid, c_vec in codebooks[j]
            ]
        )
    )["i"]


def pq_encode(
    df: DataFrame,
    codebooks: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, codes array<int>): one zero-exchange projection; encode
    parallelism is scan parallelism."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0][1])
    v = _as_double(F.col(vec_col))
    return df.select(
        F.col(id_col),
        F.array(*[_code_expr(v, codebooks, j, d_sub) for j in range(m)]).alias(
            "codes"
        ),
    )


def _lut_expr(vec, codebooks, d_sub: int):
    """Per-query ADC lookup table: m x n_codes rounded subspace
    distances, ordered by centroid_id within each subspace so
    element_at(lut[j], code+1) is the distance to the coded centroid."""
    luts = []
    for j, cb in enumerate(codebooks):
        sub = F.slice(vec, j * d_sub + 1, d_sub)
        s_self = dot(sub, sub)
        by_id = sorted(cb)  # centroid_id asc == element position
        luts.append(
            F.array(*[_d2_expr(sub, s_self, c_vec) for _cid, c_vec in by_id])
        )
    return F.array(*luts)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 30,
    codebooks: list[list[tuple[int, list[float]]]] | None = None,
) -> DataFrame:
    """Approximate top-k via PQ-ADC + exact float re-rank. Returns
    (query_id, neighbor_id, rank, cos_sim) under the shared ordering
    protocol. `codebooks` accepts a pre-trained table (the persisted-
    index path); by default they're picked from `corpus`."""
    if codebooks is None:
        codebooks = pq_codebooks(
            corpus, id_col, vec_col, dim=dim, m=m, n_codes=n_codes
        )
    d_sub = dim // m
    codes = pq_encode(corpus, codebooks, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            _lut_expr(_as_double(F.col(vec_col)), codebooks, d_sub).alias("_lut"),
        )
    )
    adc = (
        codes.crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("codes"),
                        F.col("_lut"),
                        lambda c, row: F.element_at(row, c + 1),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ).alias("adc"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    cands = (
        adc.withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= rerank)
        .select("query_id", "neighbor_id")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("_cn", norm(F.col("c_vec")))
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
        ).withColumn("_qn", norm(F.col("q_vec")))
    )
    exact = (
        cands.join(c, "neighbor_id")
        .join(qv, "query_id")
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
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    rerank: int = 30,
) -> DataFrame:
    """IVF-PQ — the standard billion-scale composite (faiss IVFPQ,
    public method): a coarse IVF quantizer routes each vector to one
    inverted list, the RESIDUAL (vector minus its coarse centroid) is
    PQ-encoded to m small ints, and a query ADC-scans only its n_probe
    probed lists with a per-(query, probed-list) residual LUT, followed
    by the shared exact float re-rank.

    Why this is THE 100 TB shape: candidates per query are
    ~n/n_centroids * n_probe rows of m BYTES each — both the candidate
    COUNT (IVF pruning) and the candidate WIDTH (PQ codes) shrink, and
    the scan arrives through one equi-join on centroid_id (the
    IVF-bucketed join; the query side broadcasts). Residual encoding is
    what makes a small per-subspace codebook usable across all lists:
    residuals live near zero regardless of which cell a vector is in.

    Determinism: coarse centroids + residual codebooks both come from
    the md5 pick; every distance follows pq.py's rounded dot-expansion
    protocol — so the DuckDB gate oracle replays the whole composite.
    Returns (query_id, neighbor_id, rank, cos_sim)."""
    from spdb_spark.functions.ivf import assign_lists, choose_centroids

    cents = choose_centroids(corpus, id_col, vec_col, n_centroids)
    cents = corpus.sparkSession.createDataFrame(
        [(int(r.centroid_id), list(r.centroid_vec)) for r in cents.collect()],
        schema="centroid_id int, centroid_vec array<double>",
    )
    d_sub = dim // m

    def residual(v_col):
        return F.zip_with(v_col, F.col("centroid_vec"), lambda a, b: a - b)

    lists = (
        assign_lists(corpus, cents, id_col, vec_col, n_probe=1)
        .join(F.broadcast(cents), "centroid_id")
        .select(
            F.col("vid").alias("neighbor_id"),
            "centroid_id",
            residual(F.col("v")).alias("resid"),
        )
    )
    # residual codebooks: md5 pick over the residual table (ids are the
    # corpus ids, so the pick is the same rows' residuals — bit-stable)
    codebooks = pq_codebooks(
        lists, "neighbor_id", "resid", dim=dim, m=m, n_codes=n_codes
    )
    codes = lists.select(
        "neighbor_id",
        "centroid_id",
        F.array(
            *[_code_expr(F.col("resid"), codebooks, j, d_sub) for j in range(m)]
        ).alias("codes"),
    )
    probes = (
        assign_lists(queries, cents, id_col, vec_col, n_probe=n_probe)
        .join(F.broadcast(cents), "centroid_id")
        .select(
            F.col("vid").alias("query_id"),
            "centroid_id",
            _lut_expr(residual(F.col("v")), codebooks, d_sub).alias("_lut"),
        )
    )
    adc = (
        codes.join(F.broadcast(probes), "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("codes"),
                        F.col("_lut"),
                        lambda c, row: F.element_at(row, c + 1),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ).alias("adc"),
        )
        # a neighbor reachable through two probed lists appears once per
        # its OWN list only (codes carry one centroid_id per vector), so
        # no dedup is needed here
    )
    wq = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    cands = (
        adc.withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= rerank)
        .select("query_id", "neighbor_id")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("_cn", norm(F.col("c_vec")))
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
        ).withColumn("_qn", norm(F.col("q_vec")))
    )
    exact = (
        cands.join(c, "neighbor_id")
        .join(qv, "query_id")
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
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def save_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_centroids: int = 16,
    m: int = 8,
    n_codes: int = 16,
) -> None:
    """Persist an IVF-PQ index: `<path>/centroids` (coarse quantizer),
    `<path>/pq_codebooks` (m * n_codes residual sub-centroids), and
    `<path>/codes` — m small ints per vector, PARTITIONED BY
    centroid_id so a probe reads n_probe/k of the files via
    directory-level pruning. This is the billion-vector layout: the
    scannable index is ~m bytes/vector (vs 8*dim for floats — 64x at
    dim 64/m 8), and the floats stay in primary storage, touched only
    for each query's re-rank candidates."""
    from spdb_spark.functions.ivf import assign_lists, choose_centroids

    cents = choose_centroids(corpus, id_col, vec_col, n_centroids)
    cents = corpus.sparkSession.createDataFrame(
        [(int(r.centroid_id), list(r.centroid_vec)) for r in cents.collect()],
        schema="centroid_id int, centroid_vec array<double>",
    )
    cents.write.mode("overwrite").parquet(path + "/centroids")
    lists = (
        assign_lists(corpus, cents, id_col, vec_col, n_probe=1)
        .join(F.broadcast(cents), "centroid_id")
        .select(
            F.col("vid"),
            "centroid_id",
            F.zip_with(F.col("v"), F.col("centroid_vec"), lambda a, b: a - b).alias(
                "resid"
            ),
        )
    )
    codebooks = pq_codebooks(lists, "vid", "resid", dim=dim, m=m, n_codes=n_codes)
    d_sub = dim // m
    corpus.sparkSession.createDataFrame(
        [
            (j, cid, vec)
            for j, cb in enumerate(codebooks)
            for cid, vec in cb
        ],
        schema="subspace int, pq_id int, sub_vec array<double>",
    ).write.mode("overwrite").parquet(path + "/pq_codebooks")
    (
        lists.select(
            "vid",
            "centroid_id",
            F.array(
                *[_code_expr(F.col("resid"), codebooks, j, d_sub) for j in range(m)]
            ).alias("codes"),
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path + "/codes")
    )


def ivfpq_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 30,
) -> DataFrame:
    """Query a persisted IVF-PQ index: probed centroid_id values prune
    the codes scan at the directory level; `corpus` supplies the float
    vectors for the exact re-rank (primary storage — only candidate
    rows are fetched). Bit-identical to the unindexed `ivfpq_topk` at
    the same settings (test-pinned)."""
    from spdb_spark.functions.ivf import assign_lists

    cents = spark.read.parquet(path + "/centroids")
    cents = spark.createDataFrame(
        [(int(r.centroid_id), list(r.centroid_vec)) for r in cents.collect()],
        schema="centroid_id int, centroid_vec array<double>",
    )
    cb_rows = spark.read.parquet(path + "/pq_codebooks").collect()
    m = 1 + max(r["subspace"] for r in cb_rows)
    codebooks: list[list[tuple[int, list[float]]]] = [[] for _ in range(m)]
    for r in cb_rows:
        codebooks[r["subspace"]].append((int(r["pq_id"]), list(r["sub_vec"])))
    for cb in codebooks:
        cb.sort()
    d_sub = dim // m
    codes = spark.read.parquet(path + "/codes").select(
        F.col("vid").alias("neighbor_id"), "centroid_id", "codes"
    )
    probes = (
        assign_lists(queries, cents, id_col, vec_col, n_probe=n_probe)
        .join(F.broadcast(cents), "centroid_id")
        .select(
            F.col("vid").alias("query_id"),
            "centroid_id",
            _lut_expr(
                F.zip_with(F.col("v"), F.col("centroid_vec"), lambda a, b: a - b),
                codebooks,
                d_sub,
            ).alias("_lut"),
        )
    )
    adc = (
        codes.join(F.broadcast(probes), "centroid_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("codes"),
                        F.col("_lut"),
                        lambda c, row: F.element_at(row, c + 1),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ).alias("adc"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    cands = (
        adc.withColumn("_r", F.row_number().over(wq))
        .where(F.col("_r") <= rerank)
        .select("query_id", "neighbor_id")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec")
    ).withColumn("_cn", norm(F.col("c_vec")))
    qv = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
        ).withColumn("_qn", norm(F.col("q_vec")))
    )
    exact = (
        cands.join(c, "neighbor_id")
        .join(qv, "query_id")
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
        exact.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )
