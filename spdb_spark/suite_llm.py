"""LLM-data-pipeline suite: dedup / similarity / text analysis / multimodal
plumbing over the documents + embeddings tables, with DuckDB oracles.

Hashing is the engine-portable md5-derived 60-bit integer
(functions/hashing.py) so minhash/simhash signatures are bit-identical
across engines. Cosine scores compute dot/norms with identical left-to-right
double summation on both sides and are rounded to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window as W_

from spdb_spark.functions import dedup as D
from spdb_spark.functions import pipeline as PL
from spdb_spark.functions import retrieval as R
from spdb_spark.functions import sampling as SP
from spdb_spark.functions import similarity as S
from spdb_spark.functions import text as T
from spdb_spark.functions.hashing import md5_long_sql
from spdb_spark.session import load_tables, truncate_lineage

_TOKENS_SQL = "regexp_split_to_array(lower(trim(text)), '\\s+')"
_SHINGLES_SQL = f"""
  SELECT DISTINCT doc_id AS doc, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(t) - 1, 1)),
             i -> concat_ws(' ', t[i], t[i+1], t[i+2])
           )) AS shingle
    FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)
  )
"""


def _docs(spark, sf_dir):
    return load_tables(spark, sf_dir, names=("documents",))["documents"]


def _embs(spark, sf_dir):
    return load_tables(spark, sf_dir, names=("embeddings",))["embeddings"]


def _docs_rowcount(sf_dir: str) -> int:
    """Row count of the documents table from the parquet FOOTER — the
    'count the caller already has' that sizes the distributed-enumeration
    fan-outs (sampling.enumeration_width) without a Spark counting job.
    At cluster scale this is catalog statistics / a manifest count."""
    import os

    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows


# --- exact + fingerprint dedup --------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dup_groups(_docs(spark, sf_dir), "doc_id", "text")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
FROM documents GROUP BY md5(text)
"""


def q_dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.fingerprint_dup_groups(_docs(spark, sf_dir), "doc_id", "text")


SQL_DEDUP_FINGERPRINT = f"""
SELECT md5(array_to_string(list_sort(list_distinct({_TOKENS_SQL})), ' '))
         AS fingerprint,
       MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
FROM documents
GROUP BY md5(array_to_string(list_sort(list_distinct({_TOKENS_SQL})), ' '))
"""


# --- n-gram Jaccard all-pairs ---------------------------------------------

_JACC_THRESHOLD = 0.5

# Stop-shingle cap run by EVERY gated pair query (r5 'What's wrong #1'):
# at 100 TB one boilerplate shingle (page header, license text) makes the
# uncapped shingle equi-join quadratic in that shingle's doc frequency, so
# the guard must be ON in the shipped configuration, not an opt-in knob.
# 100 drops nothing at the gate SFs (max df is 7 at sf0.01 / 25 at sf0.1),
# so values are unchanged there while the plan always carries the guard;
# the low-cap query `llm_dedup_jaccard_capped` pins the dropping path.
_JACC_MAX_DF = 100


def _capped_sh_sql(cap: int) -> str:
    """Oracle-side mirror of jaccard_pairs/containment_pairs' max_doc_freq:
    df-filter the shingle set BEFORE sizes/inter, exactly as Spark does."""
    return f"""kept_sh AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {cap}
),
shc AS (SELECT doc, shingle FROM sh JOIN kept_sh USING (shingle))"""


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = D.shingles(_docs(spark, sf_dir), "doc_id", "text", k=3)
    pairs = D.jaccard_pairs(
        sh, "doc_id", threshold=_JACC_THRESHOLD, max_doc_freq=_JACC_MAX_DF
    )
    return pairs.select(
        "id_a", "id_b",
        (F.floor(F.col("jaccard") * 1000000) / 1000000).alias("jaccard"),
    )


def _jaccard_pairs_sql(cap: int, threshold: float) -> str:
    return f"""
WITH sh AS ({_SHINGLES_SQL}),
{_capped_sh_sql(cap)},
sizes AS (SELECT doc, COUNT(*) AS sz FROM shc GROUP BY doc),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY a.doc, b.doc
)
SELECT i.doc_a AS id_a, i.doc_b AS id_b,
       FLOOR(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) * 1000000) / 1000000 AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc = i.doc_a
JOIN sizes sb ON sb.doc = i.doc_b
WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= {threshold}
"""


SQL_DEDUP_JACCARD = _jaccard_pairs_sql(_JACC_MAX_DF, _JACC_THRESHOLD)


# --- MinHash + LSH ---------------------------------------------------------

_MH_N, _MH_BANDS, _MH_ROWS, _MH_THRESH = 16, 8, 2, 0.5


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = D.minhash_lsh_dedup(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=3,
        num_hashes=_MH_N,
        bands=_MH_BANDS,
        rows=_MH_ROWS,
        threshold=_MH_THRESH,
        # footer-count hint -> verify="auto" resolves to broadcast at the
        # gate SFs and to the shuffle form past 1M docs (policy-tested)
        n_docs=_docs_rowcount(sf_dir),
    )
    return pairs.select(
        "id_a", "id_b",
        (F.floor(F.col("jaccard") * 1000000) / 1000000).alias("jaccard"),
    )


def q_dedup_minhash_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB verify form (shuffled joins on the flat (doc, shingle)
    table, no corpus-sized broadcast) checked against the SAME oracle as
    the broadcast form — output is identical by construction."""
    pairs = D.minhash_lsh_dedup(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        k=3,
        num_hashes=_MH_N,
        bands=_MH_BANDS,
        rows=_MH_ROWS,
        threshold=_MH_THRESH,
        verify="shuffle",
    )
    return pairs.select(
        "id_a", "id_b",
        (F.floor(F.col("jaccard") * 1000000) / 1000000).alias("jaccard"),
    )


def _minhash_pivot_sql() -> str:
    from spdb_spark.functions.dedup import minhash_rehash_sql

    mins = ",\n         ".join(
        f"MIN({minhash_rehash_sql('h31', j)}) AS m{j}" for j in range(_MH_N)
    )
    return f"""
  SELECT doc, {mins}
  FROM (
    SELECT sh.doc, ({md5_long_sql("sh.shingle")} & 2147483647) AS h31
    FROM sh
  )
  GROUP BY doc"""


def _bands_sql() -> str:
    rows = []
    for b in range(_MH_BANDS):
        cols = ", ".join(
            f"CAST(m{b * _MH_ROWS + r} AS VARCHAR)" for r in range(_MH_ROWS)
        )
        rows.append(
            f"SELECT doc, {b} AS band, md5(concat_ws(',', {cols})) AS bucket FROM sigs"
        )
    return " UNION ALL ".join(rows)


SQL_DEDUP_MINHASH = f"""
WITH sh AS ({_SHINGLES_SQL}),
sigs AS ({_minhash_pivot_sql()}),
banded AS ({_bands_sql()}),
cands AS (
  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
),
sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cands c
  JOIN sh sa ON sa.doc = c.doc_a
  JOIN sh sb ON sb.doc = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a AS id_a, i.doc_b AS id_b,
       FLOOR(CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) * 1000000) / 1000000 AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc = i.doc_a
JOIN sizes sb ON sb.doc = i.doc_b
WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= {_MH_THRESH}
"""


# --- SimHash ---------------------------------------------------------------

def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.simhash(_docs(spark, sf_dir), "doc_id", "text", bits=32)


SQL_SIMHASH = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
),
hashed AS (
  SELECT doc_id, {md5_long_sql('tok')} AS h FROM toks
),
contrib AS (
  SELECT doc_id, CAST(k.range AS INTEGER) AS k,
         SUM(CASE WHEN ((h >> CAST(k.range AS INTEGER)) & 1) = 1
                  THEN 1 ELSE -1 END) AS s
  FROM hashed CROSS JOIN range(0, 32) k
  GROUP BY doc_id, k.range
)
SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << k)
                             ELSE 0 END) AS BIGINT) AS simhash
FROM contrib GROUP BY doc_id
"""


# --- text analysis ---------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    c = F.col("text")
    # floor-scaling instead of ROUND: both engines compute bit-identical
    # doubles here, and floor is deterministic at decimal tie points where
    # ROUND half-up (Spark) vs nearbyint (DuckDB) can disagree by 1e-6.
    fl6 = lambda col: F.floor(col * 1000000) / 1000000  # noqa: E731
    # ONE token split / whitespace-strip per row, staged (the
    # quality_filter pattern): five of the signals share them.
    toked = docs.select(
        "doc_id",
        F.col("text"),
        T.tokens(c).alias("_tk"),
        F.length(F.regexp_replace(F.trim(c), r"\s+", "")).alias("_ch"),
    )
    tk, ch = F.col("_tk"), F.col("_ch")
    return toked.select(
        "doc_id",
        F.size(tk).cast("long").alias("n_tokens"),
        T.word_token_count(c).alias("n_word_tokens"),
        fl6((ch / F.size(tk).cast("long")).cast("double")).alias("mean_tok_len"),
        fl6(T._stopword_ratio_from_tokens(tk)).alias("stop_ratio"),
        fl6(T._quality_from_tokens(tk, ch)).alias("quality"),
        T._lang_from_tokens(tk).alias("pred_lang"),
    )


def _hits_sql(words) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter(t, x -> list_contains({arr}, x)))"


_H = {code: _hits_sql(words) for code, words in T.LANG_MARKERS.items()}
_STOP_HITS = _hits_sql(T.EN_STOPWORDS)

SQL_TEXT_STATS = f"""
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_word_tokens AS BIGINT) AS n_word_tokens,
       FLOOR(mean_tok_len * 1000000) / 1000000 AS mean_tok_len,
       FLOOR(stop_ratio * 1000000) / 1000000 AS stop_ratio,
       FLOOR((LEAST(n_tokens / 100.0, 1.0) * 0.4 + stop_ratio * 0.3
              + LEAST(mean_tok_len / 8.0, 1.0) * 0.3) * 1000000) / 1000000 AS quality,
       CASE WHEN GREATEST(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
            WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
            WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
            WHEN h_es >= h_fr THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM (
  SELECT doc_id,
         len(t) AS n_tokens,
         len(regexp_extract_all(lower(text), '[a-z]+')) AS n_word_tokens,
         CAST(length(regexp_replace(trim(text), '\\s+', '', 'g')) AS DOUBLE)
           / len(t) AS mean_tok_len,
         CAST({_STOP_HITS} AS DOUBLE) / len(t) AS stop_ratio,
         {_H['de']} AS h_de, {_H['en']} AS h_en,
         {_H['es']} AS h_es, {_H['fr']} AS h_fr
  FROM (SELECT doc_id, text, {_TOKENS_SQL} AS t FROM documents)
)
"""


# Past this corpus size the vocab table may blow the executor broadcast
# budget (web-scale vocab under this whitespace tokenizer is 1e8-1e9
# distinct tokens): the tok join falls back to a plain shuffle join.
_UNIGRAM_BROADCAST_MAX_DOCS = 1_000_000


def q_text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity proxy: mean log-probability of each document under the
    corpus unigram LM (token frequencies / total tokens). Low scores flag
    outlier/garbage docs — a standard cheap quality signal. Per-doc mean
    floor-scaled.

    Scale shape: the corpus total is a 1-row aggregate crossJoined back
    onto the freq table (the sampling.py CCNet pattern) — NEVER a
    single-partition window over the vocab table, which web-scale vocab
    (1e8+ tokens) would break. The tok-frequency join broadcasts the
    vocab table only below _UNIGRAM_BROADCAST_MAX_DOCS (footer-count
    hint, same policy as minhash_verify_mode); above it, a plain
    vocab-keyed shuffle join — uniform keys, AQE-splittable."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count("*").alias("tf"))
    total = freq.agg(F.sum("tf").alias("total"))
    # lp is a pure function of (tf, total): evaluate it once per VOCAB
    # entry before the join, not once per token occurrence
    freq = freq.crossJoin(F.broadcast(total)).select(
        "tok", F.log(F.col("tf") / F.col("total")).alias("lp")
    )
    if _docs_rowcount(sf_dir) <= _UNIGRAM_BROADCAST_MAX_DOCS:
        freq = F.broadcast(freq)
    scored = toks.join(freq, "tok").select("doc_id", "lp")
    return scored.groupBy("doc_id").agg(
        (F.floor(F.avg("lp") * 1000000) / 1000000).alias("mean_logprob"),
        F.count("*").alias("n_tokens"),
    )


SQL_TEXT_UNIGRAM_LOGPROB = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
),
freq AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
total AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM toks)
SELECT doc_id,
       FLOOR(AVG(LN(tf / total.n)) * 1000000) / 1000000 AS mean_logprob,
       COUNT(*) AS n_tokens
FROM toks JOIN freq USING (tok) CROSS JOIN total
GROUP BY doc_id
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", T.char_ngram_fingerprint(F.col("text"), 8).alias("fingerprint")
    )


SQL_TEXT_FINGERPRINT = """
SELECT doc_id,
       list_min(list_transform(
         range(1, greatest(length(text) - 6, 2)),
         i -> md5(substr(text, CAST(i AS INTEGER), 8))
       )) AS fingerprint
FROM documents
"""


# --- similarity search -----------------------------------------------------

def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    return S.brute_force_topk(embs, queries, "vec_id", "embedding", k=10)


SQL_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
  FROM embeddings WHERE vec_id % 50 = 0
),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(list_dot_product(q_vec, c_vec)
               / (sqrt(list_dot_product(q_vec, q_vec))
                  * sqrt(list_dot_product(c_vec, c_vec))), 6) AS cos_sim
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
)
SELECT query_id, neighbor_id, cos_sim,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 10
"""


_COS_TAU = 0.45


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: all (a<b) with cosine >= tau.
    Brute-force all-pairs is the correctness baseline; the LSH-bucketed
    variant (q_ann_lsh) is the 100TB path."""
    embs = _embs(spark, sf_dir)
    a = embs.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").cast("array<double>").alias("va"),
    ).withColumn("na", S.norm(F.col("va")))
    b = embs.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").cast("array<double>").alias("vb"),
    ).withColumn("nb", S.norm(F.col("vb")))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                S.cosine_prenormed(
                    F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
                ),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= _COS_TAU)
    )


SQL_DEDUP_EMBEDDING = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
            / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
               * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
            6) >= {_COS_TAU}
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via multi-table hyperplane LSH. Fully
    deterministic (hyperplanes are md5-derived, functions/similarity.py
    hyperplane()), so the oracle below replays the exact bucketing +
    re-rank in SQL; recall vs brute force is additionally pinned in
    tests."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    return S.lsh_topk(embs, queries, dim=64, k=10, n_planes=8, n_tables=4)


def _lsh_sig_sql(vec: str, table: int, n_planes: int = 8, dim: int = 64) -> str:
    """DuckDB expression for one table's hyperplane signature of `vec` —
    the same md5-derived plane weights as Spark's lsh_signatures (Python
    repr round-trips doubles bit-exactly into DuckDB literals), the same
    sign(dot) bit per plane. list_dot_product folds left-to-right like
    F.aggregate, so the signs agree."""
    from spdb_spark.functions.similarity import hyperplane

    terms = []
    for p in range(n_planes):
        w = hyperplane(dim, table * n_planes + p)
        lst = "[" + ", ".join(repr(c) for c in w) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec}, {lst}::DOUBLE[]) > 0"
            f" THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _lsh_sig_union_sql(src: str, id_alias: str, vec_alias: str, n_tables: int = 4) -> str:
    """UNION ALL of per-table (id, vec, tbl, sig) rows for `src` — the SQL
    analogue of exploding lsh_signatures."""
    parts = [
        f"SELECT {id_alias}, {vec_alias}, {t} AS tbl,"
        f" {_lsh_sig_sql(vec_alias, t)} AS sig FROM {src}"
        for t in range(n_tables)
    ]
    return " UNION ALL ".join(parts)


SQL_ANN_LSH = f"""
WITH c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec FROM embeddings),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
  FROM embeddings WHERE vec_id % 50 = 0
),
csig AS ({_lsh_sig_union_sql("c", "neighbor_id", "c_vec")}),
qsig AS ({_lsh_sig_union_sql("q", "query_id", "q_vec")}),
scored AS (
  SELECT DISTINCT qsig.query_id, csig.neighbor_id,
         ROUND(list_dot_product(qsig.q_vec, csig.c_vec)
               / (sqrt(list_dot_product(qsig.q_vec, qsig.q_vec))
                  * sqrt(list_dot_product(csig.c_vec, csig.c_vec))), 6) AS cos_sim
  FROM csig JOIN qsig ON csig.tbl = qsig.tbl AND csig.sig = qsig.sig
  WHERE csig.neighbor_id <> qsig.query_id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS BIGINT) AS "rank"
  FROM scored
) WHERE "rank" <= 10
"""


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN (inverted lists over a deterministic coarse
    quantizer). With refine_iters=0 (the default) the whole pipeline is
    deterministic — md5-hash centroid pick, cosine-argmax list build,
    exact re-rank — and the oracle below replays it in SQL. Recall vs
    brute force is additionally asserted in tests/test_ivf.py."""
    from spdb_spark.functions.ivf import ivf_topk

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    return ivf_topk(embs, queries, k=10, n_centroids=16, n_probe=4)


def _ivf_quantizer_sql(k: int) -> str:
    """Shared DuckDB fragments replaying the deterministic IVF quantizer
    (ivf.choose_centroids + ivf.assign_lists, refine_iters=0). Bit-identical
    to the Spark path: the centroid pick keys on the portable 60-bit md5
    hash, and dot/norm are the same left-to-right double folds on both
    engines (list_dot_product == F.aggregate fold)."""
    return f"""
base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid_src) - 1 AS INTEGER) AS centroid_id,
         c_vec
  FROM (
    SELECT vec_id AS cid_src, v AS c_vec
    FROM base
    ORDER BY {md5_long_sql("CAST(vec_id AS VARCHAR)")}, vec_id
    LIMIT {k}
  )
),
assigned AS (
  SELECT vec_id, v, centroid_id,
         ROW_NUMBER() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(v, c_vec)
                    / (sqrt(list_dot_product(v, v))
                       * sqrt(list_dot_product(c_vec, c_vec))) DESC,
                    centroid_id
         ) AS crank
  FROM base CROSS JOIN cents
)"""


SQL_ANN_IVF = f"""
WITH {_ivf_quantizer_sql(16)},
lists AS (
  SELECT vec_id AS neighbor_id, v AS c_vec, centroid_id
  FROM assigned WHERE crank = 1
),
probes AS (
  SELECT vec_id AS query_id, v AS q_vec, centroid_id
  FROM assigned WHERE crank <= 4 AND vec_id % 50 = 0
),
scored AS (
  SELECT DISTINCT p.query_id, l.neighbor_id,
         ROUND(list_dot_product(p.q_vec, l.c_vec)
               / (sqrt(list_dot_product(p.q_vec, p.q_vec))
                  * sqrt(list_dot_product(l.c_vec, l.c_vec))), 6) AS cos_sim
  FROM lists l JOIN probes p ON l.centroid_id = p.centroid_id
  WHERE l.neighbor_id <> p.query_id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS BIGINT) AS "rank"
  FROM scored
) WHERE "rank" <= 10
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup groups from exact-Jaccard pairs. The iterative
    min-label propagation converges to the component minimum, which the
    recursive-CTE reachability oracle below reproduces exactly (same
    pattern as spatial_connected_components)."""
    sh = D.shingles(_docs(spark, sf_dir), "doc_id", "text", k=3)
    pairs = D.jaccard_pairs(
        sh, "doc_id", threshold=_JACC_THRESHOLD, max_doc_freq=_JACC_MAX_DF
    )
    return D.dup_clusters(pairs)


def q_dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster maintenance driven end-to-end in the gate:
    the near-dup pairs split into a 'historical' half (clustered first)
    and a 'new batch' folded in with dedup.incremental_dup_clusters
    (existing labels collapse to their star graph; the historical pair
    set is never revisited). The result provably equals the full
    recompute — so the oracle is the UNCHANGED recursive-CTE
    reachability of SQL_DEDUP_CLUSTERS."""
    sh = D.shingles(_docs(spark, sf_dir), "doc_id", "text", k=3)
    pairs = D.jaccard_pairs(
        sh, "doc_id", threshold=_JACC_THRESHOLD, max_doc_freq=_JACC_MAX_DF
    )
    hist = pairs.where((F.col("id_a") + F.col("id_b")) % 2 == 0)
    new = pairs.where((F.col("id_a") + F.col("id_b")) % 2 == 1)
    return D.incremental_dup_clusters(D.dup_clusters(hist), new)


# Reachability closure over the symmetric near-dup edge set; cluster_id =
# MIN(reachable id) — identical to dup_clusters' converged min-label.
SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
{_capped_sh_sql(_JACC_MAX_DF)},
sizes AS (SELECT doc, COUNT(*) AS sz FROM shc GROUP BY doc),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY a.doc, b.doc
),
pairs AS (
  SELECT i.doc_a AS id_a, i.doc_b AS id_b
  FROM inter i
  JOIN sizes sa ON sa.doc = i.doc_a
  JOIN sizes sb ON sb.doc = i.doc_b
  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter) >= {_JACC_THRESHOLD}
),
e AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT DISTINCT src, src FROM e
  UNION
  SELECT e.src, reach.r FROM e JOIN reach ON e.dst = reach.id
)
SELECT id, MIN(r) AS cluster_id FROM reach GROUP BY id
"""


# --- multimodal plumbing ---------------------------------------------------

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary multimodal columns: payload + typed metadata. The
    decode itself is stubbed (no media libs in-container); the Spark-side
    schema/partition plumbing is real — see functions/multimodal.py."""
    from spdb_spark.functions.multimodal import with_media_columns

    docs = _docs(spark, sf_dir)
    media = with_media_columns(docs, "doc_id", "text")
    return media.select(
        F.col("media_id"),
        F.col("kind"),
        F.col("n_bytes"),
        F.col("checksum"),
    )


SQL_MULTIMODAL_META = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


# --- TF-IDF cosine similar-document search --------------------------------
# Probe subset (doc_id % 97 == 0) against the full corpus: all-pairs on a
# near-stopword vocabulary is quadratic, and top-k-per-probe is the actual
# retrieval shape. Integer idf scaling keeps every sum exact (see
# functions/retrieval.py docstring).


def q_tfidf_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = R.tfidf_weights(docs, "doc_id", "text", idf_scale=1000)
    probes = docs.select(F.col("doc_id").alias("doc")).where(F.col("doc") % 97 == 0)
    sims = R.tfidf_cosine(w, probes)
    rank_w = W_.partitionBy("probe_id").orderBy(F.desc("sim"), "doc_id")
    return (
        sims.withColumn("rank", F.row_number().over(rank_w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("probe_id", "doc_id", "sim", "rank")
    )


SQL_TFIDF_SIMILAR = f"""
WITH tf AS (
  SELECT doc_id AS doc, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents)
  GROUP BY doc, token
),
nn AS (SELECT COUNT(*) AS n FROM documents),
idf AS (
  SELECT token, CAST(FLOOR(ln(CAST(nn.n AS DOUBLE) / df) * 1000) AS BIGINT) AS idf_s
  FROM (SELECT token, COUNT(*) AS df FROM tf GROUP BY token) CROSS JOIN nn
),
w AS (
  SELECT doc, tf.token, tf.tf * idf.idf_s AS w
  FROM tf JOIN idf ON tf.token = idf.token
),
norms AS (SELECT doc, CAST(SUM(w * w) AS BIGINT) AS ssq FROM w GROUP BY doc),
pw AS (SELECT doc AS probe_id, token, w AS pw FROM w WHERE doc % 97 = 0),
dots AS (
  SELECT pw.probe_id, w.doc AS doc_id, CAST(SUM(pw.pw * w.w) AS BIGINT) AS dot
  FROM w JOIN pw ON w.token = pw.token
  WHERE w.doc != pw.probe_id
  GROUP BY pw.probe_id, w.doc
),
sims AS (
  SELECT probe_id, doc_id,
         FLOOR(dot / (sqrt(np.ssq) * sqrt(nd.ssq)) * 1000000.0) / 1000000.0 AS sim
  FROM dots
  JOIN norms np ON np.doc = dots.probe_id
  JOIN norms nd ON nd.doc = dots.doc_id
)
SELECT probe_id, doc_id, sim,
       CAST(row_number() OVER (PARTITION BY probe_id
                               ORDER BY sim DESC, doc_id) AS BIGINT) AS rank
FROM sims
QUALIFY rank <= 5
"""


# --- BM25 keyword search ---------------------------------------------------

_BM25_TERMS = ("scan", "merge", "stream")


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    scored = R.bm25_scores(docs, "doc_id", "text", _BM25_TERMS)
    return (
        scored.select(
            "doc_id",
            (F.floor(F.col("score") * 1000000.0) / 1000000.0).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


def _bm25_term_sql(i: int) -> str:
    # mirrors bm25_scores expression order exactly: (idf * (tf*2.2)) / denom
    return (
        f"(ln(1.0 + (CAST(nn.n AS DOUBLE) - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * 2.2))"
        f" / (tf{i} + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / nd))))"
    )


SQL_BM25_SEARCH = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS dl,
         {", ".join(f"CAST(SUM(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}" for i, t in enumerate(_BM25_TERMS))}
  FROM toks GROUP BY doc_id
),
stats AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS sum_dl, COUNT(*) AS nd,
         {", ".join(f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}" for i in range(len(_BM25_TERMS)))}
  FROM per_doc
),
nn AS (SELECT COUNT(*) AS n FROM documents)
SELECT doc_id,
       FLOOR(({" + ".join(_bm25_term_sql(i) for i in range(len(_BM25_TERMS)))})
             * 1000000.0) / 1000000.0 AS score
FROM per_doc CROSS JOIN stats CROSS JOIN nn
ORDER BY score DESC, doc_id
LIMIT 20
"""


# --- corpus vocabulary report ----------------------------------------------


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        F.explode(T.tokens(F.col("text"))).alias("token")
    )
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .withColumn(
            "rank",
            F.row_number()
            .over(W_.orderBy(F.desc("n_occurrences"), "token"))
            .cast("long"),
        )
        .where(F.col("rank") <= 50)
    )


SQL_VOCAB_TOPK = f"""
SELECT token, n_occurrences,
       CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) AS BIGINT) AS rank
FROM (
  SELECT token, COUNT(*) AS n_occurrences
  FROM (SELECT unnest({_TOKENS_SQL}) AS token FROM documents)
  GROUP BY token
)
QUALIFY rank <= 50
"""


# --- benchmark contamination ----------------------------------------------


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.contamination_pairs(
        _docs(spark, sf_dir), "doc_id", "text", "source", eval_source="src13"
    )


_FP_SQL = (
    "md5(array_to_string(list_sort(list_distinct("
    + _TOKENS_SQL
    + ")), ' '))"
)

SQL_CONTAMINATION = f"""
WITH fps AS (
  SELECT doc_id, source, {_FP_SQL} AS fp FROM documents
)
SELECT t.doc_id AS doc_id, t.source AS source, e.doc_id AS eval_doc_id
FROM fps t JOIN fps e ON t.fp = e.fp
WHERE e.source = 'src13' AND t.source != 'src13'
"""


# --- deterministic curation: hash split + stratified sample ----------------
# rand()/df.sample cannot gate against an oracle and are not reproducible
# across engines; the curation ops are pure hash functions of the row key
# (functions/sampling.py) so both engines compute identical memberships.


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return (
        SP.hash_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"))
    )


_SPLIT_BUCKET = md5_long_sql("'split' || CAST(doc_id AS VARCHAR)") + " % 10000"

SQL_HASH_SPLIT = f"""
SELECT CASE WHEN {_SPLIT_BUCKET} < 8000 THEN 'train'
            WHEN {_SPLIT_BUCKET} < 9000 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    return SP.stratified_sample(
        docs, "lang", {"en": 0.3, "zh": 0.1}, "doc_id", default_fraction=0.05
    ).select("doc_id", "lang")


_SAMPLE_BUCKET = md5_long_sql("'sample' || CAST(doc_id AS VARCHAR)") + " % 10000"

SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang
FROM documents
WHERE {_SAMPLE_BUCKET} < CASE lang WHEN 'en' THEN 3000
                                   WHEN 'zh' THEN 1000
                                   ELSE 500 END
"""


# --- quality-filter pipeline (dedup -> rules -> verdict/report) ------------


_QF_KW = dict(
    min_tokens=12,
    max_tokens=90,
    mean_tok_len_bounds=(4.0, 10.0),
    min_stop_ratio=0.01,
    langs=("en",),
    min_quality=0.3,
)


def _qf_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    drops = D.minhash_lsh_dedup(
        docs, "doc_id", "text", n_docs=_docs_rowcount(sf_dir)
    ).select(
        F.col("id_b").alias("doc_id")
    )
    return PL.quality_filter(docs, drop_ids=drops, **_QF_KW)


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-then-filter triage: the `id_b` side of every verified minhash
    near-dup pair is dropped first, then Gopher-style text rules fire in
    fixed order; output is the per-document verdict table."""
    return _qf_verdicts(spark, sf_dir)


def q_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reject-reason partition of the corpus (docs + tokens per reason)."""
    return PL.quality_report(_qf_verdicts(spark, sf_dir))


# verdict CTE shared by both oracles: stats come from SQL_TEXT_STATS, the
# drop list from SQL_DEDUP_MINHASH (CTEs nest inside subqueries in DuckDB)
_QF_VERDICT_SQL = f"""
WITH stats AS ({SQL_TEXT_STATS}),
drops AS (SELECT DISTINCT id_b AS doc_id FROM ({SQL_DEDUP_MINHASH})),
verdicts AS (
  SELECT s.doc_id, s.n_tokens, s.mean_tok_len, s.stop_ratio, s.quality,
         s.pred_lang,
         CASE WHEN d.doc_id IS NOT NULL THEN 'near_dup'
              WHEN s.n_tokens < 12 THEN 'too_short'
              WHEN s.n_tokens > 90 THEN 'too_long'
              WHEN s.mean_tok_len < 4.0 OR s.mean_tok_len > 10.0
                THEN 'bad_token_len'
              WHEN s.stop_ratio < 0.01 THEN 'low_stopword'
              WHEN s.pred_lang NOT IN ('en') THEN 'non_target_lang'
              WHEN s.quality < 0.3 THEN 'low_quality'
              ELSE 'kept' END AS reject_reason
  FROM stats s LEFT JOIN drops d ON s.doc_id = d.doc_id
)
"""

SQL_QUALITY_FILTER = f"""
{_QF_VERDICT_SQL}
SELECT doc_id, n_tokens, mean_tok_len, stop_ratio, quality, pred_lang,
       reject_reason,
       CAST(CASE WHEN reject_reason = 'kept' THEN 1 ELSE 0 END AS BIGINT)
         AS keep
FROM verdicts
"""

SQL_QUALITY_REPORT = f"""
{_QF_VERDICT_SQL}
SELECT reject_reason, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
FROM verdicts GROUP BY reject_reason
"""


# --- within-doc repetition, packing, mixture plan, keep-best, PII ---------


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style per-doc repetition metrics — pure projection, no
    shuffle/explode (see functions/text.repetition_stats)."""
    return T.repetition_stats(_docs(spark, sf_dir), "doc_id", "text", n=3)


SQL_REPETITION = f"""
WITH t AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
g AS (
  SELECT doc_id, t,
         CASE WHEN len(t) >= 3
              THEN list_transform(range(1, len(t) - 1),
                                  i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
              ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM t)
SELECT doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(len(grams) AS BIGINT) AS n_ngrams,
       CASE WHEN len(t) > 0
            THEN FLOOR((1.0 - len(list_distinct(t)) / len(t)) * 1000000) / 1000000
            ELSE 0.0 END AS dup_token_frac,
       CASE WHEN len(grams) > 0
            THEN FLOOR((1.0 - len(list_distinct(grams)) / len(grams)) * 1000000)
                 / 1000000
            ELSE 0.0 END AS dup_ngram_frac
FROM g
"""


_PACK_BUDGET = 500
_PACK_HASH = md5_long_sql("'pack' || CAST(doc_id AS VARCHAR)")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget sequence packing (hash-bucketed, offset-assigned) and
    the per-sequence fill report."""
    from spdb_spark.functions import packing as PK

    docs = _docs(spark, sf_dir).select(
        "doc_id", T.token_count(F.col("text")).alias("tok")
    )
    packed = PK.pack_sequences(docs, "doc_id", "tok", _PACK_BUDGET, n_buckets=32)
    return PK.sequence_stats(packed, "tok")


SQL_PACK_SEQUENCES = f"""
WITH d AS (
  SELECT doc_id, CAST(len({_TOKENS_SQL}) AS BIGINT) AS tok,
         {_PACK_HASH} AS h
  FROM documents),
o AS (
  SELECT h % 32 AS bucket, tok,
         CAST(SUM(tok) OVER (PARTITION BY h % 32 ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) - tok
           AS seq_offset
  FROM d)
SELECT bucket, seq_offset // {_PACK_BUDGET} AS seq_id,
       COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS seq_tokens
FROM o GROUP BY bucket, seq_id
"""


def q_pack_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training sequences: ordered doc-id arrays per sequence
    (concatenation order = deterministic packing order)."""
    from spdb_spark.functions import packing as PK

    docs = _docs(spark, sf_dir).select(
        "doc_id", T.token_count(F.col("text")).alias("tok")
    )
    packed = PK.pack_sequences(docs, "doc_id", "tok", _PACK_BUDGET, n_buckets=32)
    return PK.materialize_sequences(packed, "doc_id", "tok").select(
        "bucket",
        "seq_id",
        F.array_join(F.transform("doc_ids", lambda i: i.cast("string")), ",").alias(
            "doc_seq"
        ),
        "seq_tokens",
    )


SQL_PACK_MATERIALIZE = f"""
WITH d AS (
  SELECT doc_id, CAST(len({_TOKENS_SQL}) AS BIGINT) AS tok,
         {_PACK_HASH} AS h
  FROM documents),
o AS (
  SELECT h % 32 AS bucket, doc_id, tok,
         CAST(SUM(tok) OVER (PARTITION BY h % 32 ORDER BY h, doc_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) - tok
           AS seq_offset
  FROM d)
SELECT bucket, seq_offset // {_PACK_BUDGET} AS seq_id,
       array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY seq_offset), ',')
         AS doc_seq,
       CAST(SUM(tok) AS BIGINT) AS seq_tokens
FROM o GROUP BY bucket, seq_offset // {_PACK_BUDGET}
"""


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing plan (uniform target share)."""
    docs = _docs(spark, sf_dir).select(
        "source", T.token_count(F.col("text")).alias("tok")
    )
    return SP.mixture_plan(docs, "source", "tok")


SQL_MIXTURE_PLAN = f"""
WITH per AS (
  SELECT source AS domain, COUNT(*) AS n_docs,
         CAST(SUM(CAST(len({_TOKENS_SQL}) AS BIGINT)) AS BIGINT) AS tokens
  FROM documents GROUP BY source),
tot AS (
  SELECT CAST(SUM(tokens) AS BIGINT) AS total_tokens,
         COUNT(*) AS n_domains FROM per)
SELECT domain, n_docs, tokens,
       FLOOR(tokens * 1000000 / total_tokens) / 1000000 AS actual_share,
       LEAST(1000000,
             CAST(FLOOR((total_tokens // n_domains) * 1000000 / tokens)
                  AS BIGINT)) AS rate_ppm
FROM per CROSS JOIN tot
"""


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-copy selection inside fingerprint dup groups: keep the
    longest copy (n_chars DESC, doc_id ASC)."""
    return D.keep_best(_docs(spark, sf_dir), "doc_id", "text", "n_chars")


_FP_SQL = f"md5(array_to_string(list_sort(list_distinct({_TOKENS_SQL})), ' '))"

SQL_DEDUP_KEEP_BEST = f"""
WITH fp AS (SELECT doc_id, n_chars, {_FP_SQL} AS fingerprint FROM documents),
r AS (
  SELECT fingerprint, doc_id,
         ROW_NUMBER() OVER (PARTITION BY fingerprint
                            ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY fingerprint) AS n_docs
  FROM fp)
SELECT fingerprint, doc_id AS keep_id, n_docs, n_docs - 1 AS n_dropped
FROM r WHERE rn = 1 AND n_docs > 1
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a contact header derived from fixture columns
    (the corpus text itself contains no PII): per-kind match counts and
    the md5 of the redacted text. Chained regexp_replace/regexp_count —
    scan-speed projection, no shuffle."""
    docs = _docs(spark, sf_dir)
    raw = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".org ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".1 call +1-555-"),
        (1000 + F.col("doc_id") % 9000).cast("string"),
        F.lit("-123 "),
        F.col("text"),
    )
    staged = docs.select("doc_id", raw.alias("raw"))
    return staged.select(
        "doc_id",
        *T.pii_counts(F.col("raw")),
        F.md5(T.redact_pii(F.col("raw"))).alias("redacted_md5"),
    )


_PII_RAW = (
    "'contact user' || CAST(doc_id AS VARCHAR) || '@' || source || "
    "'.org ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1 call +1-555-' || "
    "CAST(1000 + doc_id % 9000 AS VARCHAR) || '-123 ' || text"
)
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{3,4}"

SQL_PII_REDACT = f"""
WITH s AS (SELECT doc_id, {_PII_RAW} AS raw FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(raw, '{_PII_IP}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(raw, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
       md5(regexp_replace(regexp_replace(regexp_replace(raw,
             '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_IP}', '<IP>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g')) AS redacted_md5
FROM s
"""


def q_exact_substr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring overlap: per-doc coverage by 5-grams shared with
    other docs (k-gram form of suffix-array dedup)."""
    return D.shared_ngram_coverage(_docs(spark, sf_dir), "doc_id", "text", k=5)


_GRAMS5_SQL = """
  SELECT doc_id, CAST(len(t) - 4 AS BIGINT) AS n_grams,
         unnest(list_transform(range(1, len(t) - 3),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4])))
           AS gram
  FROM (SELECT doc_id, {toks} AS t FROM documents)
  WHERE len(t) >= 5
""".format(toks=_TOKENS_SQL)

SQL_EXACT_SUBSTR = f"""
WITH g AS ({_GRAMS5_SQL}),
shared AS (
  SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1)
SELECT doc_id, n_grams, COUNT(*) AS n_shared,
       FLOOR(COUNT(*) * 1000000 / n_grams) / 1000000 AS shared_frac
FROM g JOIN shared USING (gram)
GROUP BY doc_id, n_grams
"""


def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge-step statistic: top-30 adjacent token pairs."""
    return T.bpe_pair_counts(_docs(spark, sf_dir), "text", top_n=30)


SQL_BPE_PAIRS = f"""
WITH t AS (SELECT {_TOKENS_SQL} AS t FROM documents),
p AS (
  SELECT unnest(list_transform(range(1, len(t)),
                i -> concat_ws(' ', t[i], t[i+1]))) AS pair
  FROM t WHERE len(t) >= 2)
SELECT pair, COUNT(*) AS n
FROM p GROUP BY pair
ORDER BY n DESC, pair
LIMIT 30
"""


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via IVF bucketing (SemDeDup-style) — the
    scale path for `llm_dedup_embedding`'s all-pairs baseline. Rows-only
    gate; precision/recall vs the exact baseline pinned in
    tests/test_curation.py at both sf0.01 and sf0.1.

    k pinned to the loose-tau calibration (see semantic_dedup_pairs: the
    gate's tau=0.45 is the far tail of a random cosine distribution, not
    a near-dup threshold; k=16/p=3 is the measured recall>=0.8 config
    there, while auto-k serves the tau>=0.9 regime)."""
    from spdb_spark.functions.ivf import semantic_dedup_pairs

    return semantic_dedup_pairs(
        _embs(spark, sf_dir), "vec_id", "embedding", tau=_COS_TAU, k=16,
        kernel="arrow",
    )


# Replays the deterministic bucket assignment (same quantizer fragments as
# SQL_ANN_IVF, n_probe=3) and scores pairs within shared buckets. The Arrow
# kernel's GEMM sums in a different order than the sequential fold — a ulp
# difference absorbed by the shared 6-dp HALF_UP rounding (pinned by the
# kernel-vs-fold equality tests in tests/test_curation.py).
SQL_DEDUP_SEMANTIC = f"""
WITH {_ivf_quantizer_sql(16)},
lists AS (
  SELECT vec_id, v, centroid_id FROM assigned WHERE crank <= 3
)
SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
FROM lists a JOIN lists b
  ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= {_COS_TAU}
"""


def q_approx_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB distinct-count path: per-language Apache DataSketches
    HLL sketches of the token vocabulary, merged (hll_union_agg) into a
    corpus-wide estimate row. Sketches are fixed-size and mergeable, so
    the shuffle carries KBs per partition regardless of corpus size —
    the pattern that replaces COUNT(DISTINCT) at scale.

    Tolerance-protocol oracle (r4 ask #8): sketch internals are
    engine-specific, so instead of hashing the estimate itself the query
    emits `within_tol` = [the HLL estimate is within 10% of the exact
    per-language (and merged corpus-wide) distinct count, computed in the
    same plan] — lgK=12 gives ~1.6% relative std error, so 10% is >5
    sigma. The oracle asserts the same columns with within_tol=1, making
    the bound a driver-hashable exact check; n_tokens stays an exact
    cross-engine value check. tests/test_curation.py additionally pins
    the raw estimate."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "lang", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    per_lang = toks.groupBy("lang").agg(
        F.hll_sketch_agg("tok", 12).alias("sk"),
        F.count("*").alias("n_tokens"),
        F.count_distinct("tok").alias("exact_distinct"),
    )
    union = per_lang.agg(
        F.lit("ALL").alias("lang"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_distinct"),
        F.sum("n_tokens").alias("n_tokens"),
    ).crossJoin(
        toks.agg(F.count_distinct("tok").alias("exact_distinct"))
    )
    both = per_lang.select(
        "lang",
        F.hll_sketch_estimate("sk").alias("approx_distinct"),
        "n_tokens",
        "exact_distinct",
    ).unionByName(union.select("lang", "approx_distinct", "n_tokens", "exact_distinct"))
    return both.select(
        "lang",
        "n_tokens",
        (
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct")
            )
            <= 0.10
        )
        .cast("long")
        .alias("within_tol"),
    )


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 symmetric embedding quantization (functions/quantize.py) —
    the 8x storage/shuffle shrink for embedding tables. Output exploded
    to scalar rows (vec_id, d, q, scale) so the oracle compares exactly;
    restricted to vec_id % 20 = 0 to bound row count."""
    from spdb_spark.functions.quantize import quantize_embeddings

    qd = quantize_embeddings(
        _embs(spark, sf_dir).where(F.col("vec_id") % 20 == 0)
    )
    return qd.select(
        "vec_id",
        F.round(F.col("scale"), 9).alias("scale"),
        F.posexplode("qvec").alias("d", "q"),
    ).select("vec_id", "d", F.col("q").cast("int").alias("q"), "scale")


SQL_EMBED_QUANTIZE = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale
  FROM embeddings WHERE vec_id % 20 = 0
)
SELECT vec_id, CAST(u.d - 1 AS INTEGER) AS d,
       CAST(CASE WHEN scale = 0 THEN 0
            ELSE greatest(-127.0, least(127.0,
                 sign(v[u.d] / scale) * floor(abs(v[u.d] / scale) + 0.5)))
       END AS INTEGER) AS q,
       ROUND(scale, 9) AS scale
FROM base, LATERAL (SELECT unnest(generate_series(1, len(v))) AS d) u
"""


def q_ann_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage quantized ANN (functions/quantize.quantized_topk): int8
    candidate scoring + exact float re-rank. Deterministic end-to-end —
    integer dot products are exact in IEEE doubles (< 2^53), so the
    oracle replays candidate ordering and the re-rank bit-for-bit."""
    from spdb_spark.functions.quantize import quantized_topk

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    return quantized_topk(embs, queries, k=10, rerank=30)


SQL_ANN_QUANTIZED = """
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale
  FROM embeddings
),
qv AS (
  SELECT vec_id, v,
         CASE WHEN scale = 0 THEN list_transform(v, x -> 0.0)
              ELSE list_transform(v, x -> greatest(-127.0, least(127.0,
                   sign(x / scale) * floor(abs(x / scale) + 0.5))))
         END AS q
  FROM base
),
cands AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY qq.vec_id
             ORDER BY list_dot_product(cc.q, qq.q)
                      / (sqrt(list_dot_product(cc.q, cc.q))
                         * sqrt(list_dot_product(qq.q, qq.q))) DESC,
                      cc.vec_id
           ) AS qr
    FROM qv cc CROSS JOIN qv qq
    WHERE qq.vec_id % 50 = 0 AND cc.vec_id <> qq.vec_id
  ) WHERE qr <= 30
),
rescored AS (
  SELECT c.query_id, c.neighbor_id,
         ROUND(list_dot_product(q.v, n.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(n.v, n.v))), 6) AS cos_sim
  FROM cands c
  JOIN base n ON n.vec_id = c.neighbor_id
  JOIN base q ON q.vec_id = c.query_id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS BIGINT) AS "rank"
  FROM rescored
) WHERE "rank" <= 10
"""



# --- paragraph-level dedup + deterministic corpus shuffle ------------------

_PD_CHUNK = 3  # fixture texts have no structural delimiter; 3-word chunks
               # give the synthetic vocabulary real cross-doc collisions


def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style duplicated-paragraph removal + doc reassembly."""
    docs = _docs(spark, sf_dir)
    paras = D.word_chunk_paragraphs(docs, "doc_id", "text", _PD_CHUNK)
    kept = D.paragraph_dedup(paras, min_df=2)
    return D.reassemble_paragraph_docs(paras, kept).select(
        F.col("doc").alias("doc_id"), "clean_text", "n_paras", "n_kept"
    )


SQL_PARAGRAPH_DEDUP = f"""
WITH toks AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
paras AS (
  SELECT doc_id, i AS idx,
         array_to_string(t[(i*{_PD_CHUNK}+1):(i*{_PD_CHUNK}+{_PD_CHUNK})], ' ') AS para
  FROM toks,
       UNNEST(range(0, greatest(CAST(ceil(len(t) / {_PD_CHUNK}.0) AS BIGINT), 1))) AS u(i)
),
flagged AS (
  SELECT doc_id, idx, para,
         COUNT(*) OVER (PARTITION BY md5(para)) AS df,
         ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY doc_id, idx) AS rn
  FROM paras
),
kept AS (SELECT doc_id, idx, para FROM flagged WHERE df < 2 OR rn = 1),
totals AS (SELECT doc_id, COUNT(*) AS n_paras FROM paras GROUP BY doc_id),
reasm AS (
  SELECT doc_id, string_agg(para, ' ' ORDER BY idx) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, COALESCE(r.clean_text, '') AS clean_text,
       t.n_paras, COALESCE(r.n_kept, 0) AS n_kept
FROM totals t LEFT JOIN reasm r USING (doc_id)
"""


def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-ordering shuffle: exact global positions via
    bucketed distributed enumeration (no single-partition sort). The
    bucket width is DERIVED from the table's footer row count
    (enumeration_width policy — a non-default width at the gate SFs,
    exercising the invariance the tests pin)."""
    docs = _docs(spark, sf_dir)
    return SP.deterministic_shuffle(
        docs, "doc_id", seed="42", n_rows=_docs_rowcount(sf_dir)
    ).select("doc_id", "shuffle_key", "position")


SQL_CORPUS_SHUFFLE = """
SELECT doc_id, md5('42:' || doc_id) AS shuffle_key,
       ROW_NUMBER() OVER (ORDER BY md5('42:' || doc_id), doc_id) AS position
FROM documents
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation in ONE plan — the realistic 100 TB composition:
    minhash near-dup triage + Gopher-style quality rules (quality_filter)
    -> paragraph-level boilerplate removal on the kept docs -> deterministic
    train/val/test split -> final per-(split, lang) shipping report with
    CLEANED token counts. Every stage is the already-gated operator; this
    gate pins that they compose (ids line up, nothing double-drops, token
    accounting reflects the cleaned text)."""
    docs = _docs(spark, sf_dir)
    kept_ids = (
        _qf_verdicts(spark, sf_dir)
        .where(F.col("reject_reason") == "kept")
        .select("doc_id")
    )
    kept_docs = docs.join(kept_ids, "doc_id")
    paras = D.word_chunk_paragraphs(kept_docs, "doc_id", "text", _PD_CHUNK)
    # Checkpoint the chunked-paragraph table once (lazy): three plan
    # subtrees consume it (dedup stats build, dedup occurrence probe,
    # reassembly totals), and each replica would otherwise re-run the
    # ENTIRE upstream triage — the minhash-LSH verdict chain included.
    # One materialization = one triage pass over the corpus instead of
    # three, at any scale.
    paras = truncate_lineage(paras, eager=False)
    kept_paras = D.paragraph_dedup(paras, min_df=2)
    clean = (
        D.reassemble_paragraph_docs(paras, kept_paras)
        .select(F.col("doc").alias("doc_id"), "clean_text")
        .join(docs.select("doc_id", "lang"), "doc_id")
    )
    return (
        SP.hash_split(clean, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(T.token_count(F.col("clean_text"))).alias("n_tokens"),
        )
    )


_CLEAN_TOKENS_SQL = (
    "CAST(len(regexp_split_to_array(lower(trim(clean_text)), '\\s+')) AS BIGINT)"
)

SQL_CURATION_PIPELINE = f"""
{_QF_VERDICT_SQL},
kept AS (SELECT doc_id FROM verdicts WHERE reject_reason = 'kept'),
ktoks AS (
  SELECT d.doc_id, d.lang, {_TOKENS_SQL} AS t
  FROM documents d JOIN kept USING (doc_id)
),
kparas AS (
  SELECT doc_id, i AS idx,
         array_to_string(t[(i*{_PD_CHUNK}+1):(i*{_PD_CHUNK}+{_PD_CHUNK})], ' ') AS para
  FROM ktoks,
       UNNEST(range(0, greatest(CAST(ceil(len(t) / {_PD_CHUNK}.0) AS BIGINT), 1))) AS u(i)
),
kflagged AS (
  SELECT doc_id, idx, para,
         COUNT(*) OVER (PARTITION BY md5(para)) AS df,
         ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY doc_id, idx) AS rn
  FROM kparas
),
kkept AS (SELECT doc_id, idx, para FROM kflagged WHERE df < 2 OR rn = 1),
kreasm AS (
  SELECT doc_id, string_agg(para, ' ' ORDER BY idx) AS clean_text
  FROM kkept GROUP BY doc_id
),
cleaned AS (
  SELECT k.doc_id, k.lang, COALESCE(r.clean_text, '') AS clean_text
  FROM (SELECT DISTINCT doc_id, lang FROM ktoks) k
  LEFT JOIN kreasm r USING (doc_id)
)
SELECT CASE WHEN {_SPLIT_BUCKET} < 8000 THEN 'train'
            WHEN {_SPLIT_BUCKET} < 9000 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs, CAST(SUM({_CLEAN_TOKENS_SQL}) AS BIGINT) AS n_tokens
FROM cleaned
GROUP BY 1, 2
"""


# --- passage-level retrieval (RAG chunk-and-search) -------------------------

_PSG_WINDOW, _PSG_STRIDE = 12, 6


def q_passage_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 over overlapping word-window passages: the retrieval unit a
    RAG pipeline actually serves. Passage construction is a narrow
    posexplode; scoring reuses the gated doc-level BM25 with passage-local
    length normalization."""
    docs = _docs(spark, sf_dir)
    psg = R.passages(docs, "doc_id", "text", _PSG_WINDOW, _PSG_STRIDE).select(
        F.concat_ws(
            "#", F.col("doc").cast("string"), F.col("idx").cast("string")
        ).alias("pid"),
        "passage",
    )
    scored = R.bm25_scores(psg, "pid", "passage", _BM25_TERMS)
    return (
        scored.select(
            F.col("doc_id").alias("pid"),
            (F.floor(F.col("score") * 1000000.0) / 1000000.0).alias("score"),
        )
        .orderBy(F.desc("score"), "pid")
        .limit(20)
    )


SQL_PASSAGE_SEARCH = f"""
WITH pt AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
psg AS (
  SELECT CAST(doc_id AS VARCHAR) || '#' || CAST(i AS VARCHAR) AS pid,
         t[(i*{_PSG_STRIDE}+1):(i*{_PSG_STRIDE}+{_PSG_WINDOW})] AS ptoks
  FROM pt,
       UNNEST(range(0, 1 + CAST(ceil(greatest(len(t) - {_PSG_WINDOW}, 0)
                                     / {_PSG_STRIDE}.0) AS BIGINT))) AS u(i)
),
toks AS (SELECT pid, unnest(ptoks) AS token FROM psg),
per_doc AS (
  SELECT pid, COUNT(*) AS dl,
         {", ".join(f"CAST(SUM(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}" for i, t in enumerate(_BM25_TERMS))}
  FROM toks GROUP BY pid
),
stats AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS sum_dl, COUNT(*) AS nd,
         {", ".join(f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}" for i in range(len(_BM25_TERMS)))}
  FROM per_doc
),
nn AS (SELECT COUNT(*) AS n FROM psg)
SELECT pid,
       FLOOR(({" + ".join(_bm25_term_sql(i) for i in range(len(_BM25_TERMS)))})
             * 1000000.0) / 1000000.0 AS score
FROM per_doc CROSS JOIN stats CROSS JOIN nn
ORDER BY score DESC, pid
LIMIT 20
"""


# --- hybrid lexical+semantic search (reciprocal rank fusion) ----------------

_RRF_K = 60
_HYB_BRANCH_K = 50


def q_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of BM25 keyword ranking and exact cosine ranking to a
    fixed query (doc/vec 0): score = sum over branches of 1/(60 + rank),
    missing-from-branch contributes 0. The scale shape is
    top-k-per-branch THEN fuse — each branch is a TakeOrdered of bounded
    size, so the fusion join and its rank windows run over <= 2k rows
    regardless of corpus size (the single-partition window warning on a
    50-row set is the intended bounded step)."""
    docs = _docs(spark, sf_dir)
    embs = _embs(spark, sf_dir)
    lex = (
        R.bm25_scores(docs, "doc_id", "text", _BM25_TERMS)
        .select(
            "doc_id", (F.floor(F.col("score") * 1000000.0) / 1000000.0).alias("s")
        )
        .orderBy(F.desc("s"), "doc_id")
        .limit(_HYB_BRANCH_K)
        .withColumn(
            "lex_rank",
            F.row_number().over(W_.orderBy(F.desc("s"), "doc_id")).cast("long"),
        )
        .select(F.col("doc_id").alias("id"), "lex_rank")
    )
    sem = S.brute_force_topk(
        embs, embs.where(F.col("vec_id") == 0), "vec_id", "embedding",
        k=_HYB_BRANCH_K,
    ).select(F.col("neighbor_id").alias("id"), F.col("rank").alias("sem_rank"))
    fused = lex.join(sem, "id", "full_outer").select(
        "id",
        (
            F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(_RRF_K) + F.col("sem_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.select(
            "id", (F.floor(F.col("rrf") * 1000000.0) / 1000000.0).alias("rrf_score")
        )
        .orderBy(F.desc("rrf_score"), "id")
        .limit(20)
    )


SQL_HYBRID_SEARCH = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS token FROM documents
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS dl,
         {", ".join(f"CAST(SUM(CASE WHEN token = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS tf{i}" for i, t in enumerate(_BM25_TERMS))}
  FROM toks GROUP BY doc_id
),
stats AS (
  SELECT CAST(SUM(dl) AS BIGINT) AS sum_dl, COUNT(*) AS nd,
         {", ".join(f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}" for i in range(len(_BM25_TERMS)))}
  FROM per_doc
),
nn AS (SELECT COUNT(*) AS n FROM documents),
lexs AS (
  SELECT doc_id,
         FLOOR(({" + ".join(_bm25_term_sql(i) for i in range(len(_BM25_TERMS)))})
               * 1000000.0) / 1000000.0 AS s
  FROM per_doc CROSS JOIN stats CROSS JOIN nn
  ORDER BY s DESC, doc_id LIMIT {_HYB_BRANCH_K}
),
lex AS (
  SELECT doc_id AS id,
         CAST(ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS BIGINT) AS lex_rank
  FROM lexs
),
qv AS (SELECT embedding::DOUBLE[] AS q_vec FROM embeddings WHERE vec_id = 0),
semt AS (
  SELECT vec_id AS id,
         ROUND(list_dot_product(q_vec, embedding::DOUBLE[])
               / (sqrt(list_dot_product(q_vec, q_vec))
                  * sqrt(list_dot_product(embedding::DOUBLE[],
                                          embedding::DOUBLE[]))), 6) AS cos_sim
  FROM embeddings CROSS JOIN qv
  WHERE vec_id <> 0
),
sem AS (
  SELECT id,
         CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, id) AS BIGINT) AS sem_rank
  FROM semt
  ORDER BY cos_sim DESC, id LIMIT {_HYB_BRANCH_K}
)
SELECT COALESCE(lex.id, sem.id) AS id,
       FLOOR((COALESCE(1.0 / ({_RRF_K} + lex_rank), 0.0)
              + COALESCE(1.0 / ({_RRF_K} + sem_rank), 0.0)) * 1000000.0)
         / 1000000.0 AS rrf_score
FROM lex FULL JOIN sem ON lex.id = sem.id
ORDER BY rrf_score DESC, id
LIMIT 20
"""


_RSV_K = 5


def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-language sample (hash-reservoir): balanced
    eval-subset construction that survives reprocessing and growth.
    Subgroup width derived from the footer row count (non-default at the
    gate SFs — pins width-invariance in the driver gate)."""
    return SP.reservoir_per_group(
        _docs(spark, sf_dir),
        "lang",
        "doc_id",
        _RSV_K,
        salt="rsv",
        n_rows=_docs_rowcount(sf_dir),
    ).select("lang", "doc_id")


SQL_RESERVOIR_SAMPLE = f"""
SELECT lang, doc_id FROM documents
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY lang ORDER BY md5('rsv:' || doc_id), doc_id) <= {_RSV_K}
"""


def q_paragraph_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit trail of the paragraph dedup: dropped occurrence -> its
    canonical surviving copy."""
    docs = _docs(spark, sf_dir)
    paras = D.word_chunk_paragraphs(docs, "doc_id", "text", _PD_CHUNK)
    return D.paragraph_provenance(paras, min_df=2).select(
        F.col("doc").alias("doc_id"), "idx", "canonical_doc", "canonical_idx"
    )


SQL_PARAGRAPH_PROVENANCE = f"""
WITH toks AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
paras AS (
  SELECT doc_id, i AS idx,
         array_to_string(t[(i*{_PD_CHUNK}+1):(i*{_PD_CHUNK}+{_PD_CHUNK})], ' ') AS para
  FROM toks,
       UNNEST(range(0, greatest(CAST(ceil(len(t) / {_PD_CHUNK}.0) AS BIGINT), 1))) AS u(i)
),
flagged AS (
  SELECT doc_id, idx,
         COUNT(*) OVER (PARTITION BY md5(para)) AS df,
         FIRST_VALUE(doc_id) OVER w AS canonical_doc,
         FIRST_VALUE(idx) OVER w AS canonical_idx
  FROM paras
  WINDOW w AS (PARTITION BY md5(para) ORDER BY doc_id, idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT doc_id, idx, canonical_doc, canonical_idx
FROM flagged
WHERE df >= 2 AND (doc_id <> canonical_doc OR idx <> canonical_idx)
"""


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end dedup output: which documents survive. Near-dup
    pairs -> transitive clusters -> keep the best copy per cluster
    (longest text, ties to smallest id); unclustered docs survive as
    their own cluster. One cluster-keyed argmax aggregate + back-join —
    no window over the corpus."""
    docs = _docs(spark, sf_dir)
    sh = D.shingles(docs, "doc_id", "text", k=3)
    pairs = D.jaccard_pairs(
        sh, "doc_id", threshold=_JACC_THRESHOLD, max_doc_freq=_JACC_MAX_DF
    ).select(
        "id_a", "id_b"
    )
    labels = D.dup_clusters(pairs)
    with_cl = docs.join(labels, docs.doc_id == labels.id, "left").select(
        "doc_id",
        "n_chars",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cl"),
    )
    best = with_cl.groupBy("cl").agg(
        F.min(
            F.struct(
                (-F.col("n_chars")).alias("nq"), F.col("doc_id").alias("kid")
            )
        ).alias("m")
    )
    return with_cl.join(best, "cl").select(
        "doc_id",
        F.col("cl").alias("cluster_id"),
        (F.col("doc_id") == F.col("m.kid")).cast("int").alias("survives"),
    )


SQL_DEDUP_SURVIVORS = f"""
WITH labels AS ({SQL_DEDUP_CLUSTERS}),
alldocs AS (
  SELECT d.doc_id, d.n_chars, COALESCE(l.cluster_id, d.doc_id) AS cl
  FROM documents d LEFT JOIN labels l ON d.doc_id = l.id
),
best AS (
  SELECT cl, doc_id AS kid FROM alldocs
  QUALIFY ROW_NUMBER() OVER (PARTITION BY cl ORDER BY n_chars DESC, doc_id) = 1
)
SELECT a.doc_id, a.cl AS cluster_id,
       CAST(CASE WHEN a.doc_id = b.kid THEN 1 ELSE 0 END AS INT) AS survives
FROM alldocs a JOIN best b USING (cl)
"""


def q_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture plan MATERIALIZED: the rebalanced corpus itself (docs kept
    under each domain's deterministic ppm rate)."""
    docs = _docs(spark, sf_dir)
    plan = SP.mixture_plan(
        docs.select("source", T.token_count(F.col("text")).alias("tok")),
        "source",
        "tok",
    )
    return SP.apply_mixture(docs, "source", "doc_id", plan).select(
        "doc_id", "source"
    )


_MIX_BUCKET = md5_long_sql("'mix:' || CAST(doc_id AS VARCHAR)") + " % 1000000"

SQL_MIXTURE_APPLY = f"""
WITH plan AS ({SQL_MIXTURE_PLAN})
SELECT d.doc_id, d.source
FROM documents d JOIN plan p ON d.source = p.domain
WHERE {_MIX_BUCKET} < p.rate_ppm
"""


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per eval-source doc: fraction of its 3-grams absent from every
    other source (low = eval text reappears in training data)."""
    return D.cross_corpus_gram_novelty(
        _docs(spark, sf_dir), "doc_id", "text", "source", "src13", k=3
    )


SQL_NGRAM_NOVELTY = f"""
WITH g AS (
  SELECT doc_id, source,
         CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n_grams,
         unnest(list_transform(
           range(1, greatest(len(t) - 1, 1)),
           i -> concat_ws(' ', t[i], t[i+1], t[i+2])
         )) AS gram
  FROM (SELECT doc_id, source, {_TOKENS_SQL} AS t FROM documents)
),
seen AS (
  SELECT DISTINCT gram FROM g WHERE source != 'src13'
)
SELECT e.doc_id, e.n_grams,
       CAST(SUM(CASE WHEN s.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_seen,
       1.0 - FLOOR(SUM(CASE WHEN s.gram IS NOT NULL THEN 1 ELSE 0 END)
                   * 1000000 / e.n_grams) / 1000000 AS novelty_frac
FROM g e LEFT JOIN seen s ON e.gram = s.gram
WHERE e.source = 'src13' AND e.n_grams > 0
GROUP BY e.doc_id, e.n_grams
"""

# --- round-5 additions -----------------------------------------------------


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup pairs (dedup.simhash_neardup_pairs):
    band-keyed candidate join + exact Hamming verify — completes the
    SimHash story beyond per-doc signatures. Pigeonhole-exact recall at
    max_hamming <= bands-1."""
    return D.simhash_neardup_pairs(
        _docs(spark, sf_dir), "doc_id", "text", bits=32, bands=4, max_hamming=3
    )


SQL_SIMHASH_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOKENS_SQL}) AS tok FROM documents
),
hashed AS (
  SELECT doc_id, {md5_long_sql('tok')} AS h FROM toks
),
contrib AS (
  SELECT doc_id, CAST(k.range AS INTEGER) AS k,
         SUM(CASE WHEN ((h >> CAST(k.range AS INTEGER)) & 1) = 1
                  THEN 1 ELSE -1 END) AS s
  FROM hashed CROSS JOIN range(0, 32) k
  GROUP BY doc_id, k.range
),
sig AS (
  SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << k)
                               ELSE 0 END) AS BIGINT) AS simhash
  FROM contrib GROUP BY doc_id
),
banded AS (
  SELECT doc_id, simhash, CAST(b.range AS INTEGER) AS band,
         (simhash >> (CAST(b.range AS INTEGER) * 8)) % 256 AS band_key
  FROM sig CROSS JOIN range(0, 4) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
"""


def q_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity proxy #2: mean log-probability of each document under
    an add-one-smoothed corpus BIGRAM LM — the next-order quality signal
    after `llm_text_unigram_logprob` (catches shuffled-word garbage that
    unigram stats miss). Counts are two corpus aggregates; the per-doc
    score is a join on the gram + prefix tables and one partial-agg
    groupBy. Docs with < 2 tokens have no bigrams and are excluded."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", T.tokens(F.col("text")).alias("_toks"))
    grams = T.exploded_word_ngrams(
        toks, "_toks", 2, out="gram", keep=("doc_id",)
    ).withColumn("prefix", F.substring_index("gram", " ", 1))
    c2 = grams.groupBy("gram").agg(F.count("*").alias("c2"))
    c1 = grams.groupBy("prefix").agg(F.count("*").alias("c1"))
    vocab = docs.select(
        F.explode(T.tokens(F.col("text"))).alias("tok")
    ).agg(F.count_distinct("tok").alias("v"))
    # per-TYPE scoring (the kn_ngram_logprob shape): lp is a pure
    # function of (c2, c1, v), so score each distinct gram once and
    # attach by gram — the count joins act on the type table and the
    # corpus-sized gram stream joins exactly once
    type_lp = (
        c2.withColumn("prefix", F.substring_index("gram", " ", 1))
        .join(c1, "prefix")
        .crossJoin(F.broadcast(vocab))
        .select(
            "gram",
            F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v"))).alias("lp"),
        )
    )
    scored = grams.join(type_lp, "gram").select("doc_id", "lp")
    return scored.groupBy("doc_id").agg(
        (F.floor(F.avg("lp") * 1000000) / 1000000).alias("mean_logprob"),
        F.count("*").alias("n_bigrams"),
    )


SQL_BIGRAM_LOGPROB = f"""
WITH t AS (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> concat_ws(' ', t[i], t[i+1]))) AS gram
  FROM t WHERE len(t) >= 2
),
pre AS (SELECT doc_id, gram, split_part(gram, ' ', 1) AS prefix FROM grams),
c2 AS (SELECT gram, COUNT(*) AS c2 FROM pre GROUP BY gram),
c1 AS (SELECT prefix, COUNT(*) AS c1 FROM pre GROUP BY prefix),
v AS (
  SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
  FROM (SELECT unnest({_TOKENS_SQL}) AS tok FROM documents)
)
SELECT doc_id,
       FLOOR(AVG(LN((c2 + 1) / CAST(c1 + v.v AS DOUBLE))) * 1000000) / 1000000
         AS mean_logprob,
       COUNT(*) AS n_bigrams
FROM pre JOIN c2 USING (gram) JOIN c1 USING (prefix) CROSS JOIN v
GROUP BY doc_id
"""


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust embedding-norm outlier flagging (median/MAD — order
    statistics, not mean/std, so the flags are bit-deterministic across
    engines and robust to the outliers themselves): vectors whose norm
    deviates from the corpus median by > 3.5 MAD are flagged — the
    standard screen for broken encoders / zero vectors before indexing.
    Two tiny percentile aggregates broadcast back over one corpus scan."""
    from spdb_spark.functions.similarity import _as_double, norm

    embs = _embs(spark, sf_dir)
    norms = embs.select(
        "vec_id", "label", norm(_as_double(F.col("embedding"))).alias("nrm")
    )
    med = norms.agg(F.expr("percentile(nrm, 0.5)").alias("med"))
    dev = norms.crossJoin(F.broadcast(med)).select(
        "vec_id", "label", "nrm", F.abs(F.col("nrm") - F.col("med")).alias("dev")
    )
    mad = dev.agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    return dev.crossJoin(F.broadcast(mad)).select(
        "vec_id",
        "label",
        (F.floor(F.col("nrm") * 1000000) / 1000000).alias("norm6"),
        (F.col("dev") > 3.5 * F.col("mad")).cast("long").alias("is_outlier"),
    )


SQL_EMBEDDING_OUTLIERS = """
WITH n AS (
  SELECT vec_id, label,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
  FROM embeddings
),
med AS (SELECT quantile_cont(nrm, 0.5) AS med FROM n),
d AS (SELECT vec_id, label, nrm, abs(nrm - med.med) AS dev FROM n CROSS JOIN med),
mad AS (SELECT quantile_cont(dev, 0.5) AS mad FROM d)
SELECT vec_id, label,
       FLOOR(nrm * 1000000) / 1000000 AS norm6,
       CAST(dev > 3.5 * mad.mad AS BIGINT) AS is_outlier
FROM d CROSS JOIN mad
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization pass (text.normalize_text): lowercase, collapse
    non-alphanumeric runs to single spaces, trim — the canonicalization
    applied before hashing/matching. Shuffle-free projection; emits the
    md5 of the normalized text (the dedup key) plus its length."""
    docs = _docs(spark, sf_dir)
    norm_c = T.normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(norm_c).alias("norm_hash"),
        F.length(norm_c).cast("long").alias("norm_len"),
    )


SQL_TEXT_NORMALIZE = """
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s
  FROM documents
)
SELECT doc_id, md5(s) AS norm_hash, CAST(length(s) AS BIGINT) AS norm_len
FROM n
"""


def _cache_dir(sf_dir: str, name: str) -> str:
    """Per-sf_dir cache location for persisted index fixtures built by
    gate queries (deterministic content — safe to reuse across calls).

    The key includes a CONTENT fingerprint of the source parquet
    (per-file sizes + mtimes of documents/ and embeddings/), not just
    the path: regenerating the fixture data at the same path must miss
    the cache, never silently reuse an index built from the old data."""
    import hashlib
    import os
    import tempfile

    h = hashlib.md5(os.path.abspath(sf_dir).encode())
    for table in ("documents.parquet", "embeddings.parquet"):
        src = os.path.join(sf_dir, table)
        entries = sorted(os.listdir(src)) if os.path.isdir(src) else [""]
        for entry in entries:
            full = os.path.join(src, entry) if entry else src
            try:
                st = os.stat(full)
            except OSError:
                continue
            h.update(f"{entry}:{st.st_size}:{st.st_mtime_ns}".encode())
    key = h.hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"spdb_spark_cache_{key}", name)


def q_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search on the persisted IVF index with recall
    escalation driven end-to-end: k=25 against ~10%-selective metadata
    (label = 6) and a single probed list leaves every query short of k
    in its probed candidates, so each escalates to the full filtered
    scan — the result is exact filtered brute-force top-k (which is what
    the oracle replays). Closes the r4 'test-pinned only' gap for
    filtered search."""
    import os

    from spdb_spark.functions.ivf import ivf_topk_indexed, save_index

    embs = _embs(spark, sf_dir)
    path = _cache_dir(sf_dir, "ivf_label")
    if not (
        os.path.exists(os.path.join(path, "centroids", "_SUCCESS"))
        and os.path.exists(os.path.join(path, "lists", "_SUCCESS"))
    ):
        save_index(embs, path, n_centroids=16, meta_cols=["label"])
    queries = embs.where(F.col("vec_id") % 100 == 0)
    return ivf_topk_indexed(
        spark, path, queries, k=25, n_probe=1, where="label = 6"
    )


SQL_ANN_FILTERED = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
  FROM embeddings WHERE vec_id % 100 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec
  FROM embeddings WHERE label = 6
),
scored AS (
  SELECT query_id, neighbor_id,
         ROUND(list_dot_product(q_vec, c_vec)
               / (sqrt(list_dot_product(q_vec, q_vec))
                  * sqrt(list_dot_product(c_vec, c_vec))), 6) AS cos_sim
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
)
SELECT query_id, neighbor_id, cos_sim,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 25
"""


def q_bm25_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 from the PERSISTED index (posting-pruned scan + broadcast
    stats), driver-gated against the same oracle as the full-scan
    `llm_bm25_search` — the index path is bit-identical by construction
    (same fixed-order score expression). Closes the r4 'test-only' gap
    for the persisted BM25 index."""
    import os

    from spdb_spark.functions.retrieval import bm25_search_indexed, save_bm25_index

    docs = _docs(spark, sf_dir)
    path = _cache_dir(sf_dir, "bm25")
    if not os.path.exists(os.path.join(path, "tf", "_SUCCESS")):
        save_bm25_index(docs, "doc_id", "text", path)
    scored = bm25_search_indexed(spark, path, _BM25_TERMS)
    return (
        scored.select(
            "doc_id",
            (F.floor(F.col("score") * 1000000.0) / 1000000.0).alias("score"),
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment (|A∩B|/|A|) — catches partial
    copies symmetric Jaccard under-scores. Floor-scaled for the hash
    gate; threshold applied on the exact unscaled ratio in both
    engines."""
    sh = D.shingles(_docs(spark, sf_dir), "doc_id", "text", k=3)
    pairs = D.containment_pairs(
        sh, "doc_id", threshold=0.5, max_doc_freq=_JACC_MAX_DF
    )
    return pairs.select(
        "id_a",
        "id_b",
        (F.floor(F.col("containment_a") * 1000000) / 1000000).alias("containment_a"),
        (F.floor(F.col("containment_b") * 1000000) / 1000000).alias("containment_b"),
    )


SQL_DEDUP_CONTAINMENT = f"""
WITH sh AS ({_SHINGLES_SQL}),
{_capped_sh_sql(_JACC_MAX_DF)},
sizes AS (SELECT doc, COUNT(*) AS sz FROM shc GROUP BY doc),
inter AS (
  SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS inter
  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY a.doc, b.doc
)
SELECT i.doc_a AS id_a, i.doc_b AS id_b,
       FLOOR(CAST(i.inter AS DOUBLE) / sa.sz * 1000000) / 1000000 AS containment_a,
       FLOOR(CAST(i.inter AS DOUBLE) / sb.sz * 1000000) / 1000000 AS containment_b
FROM inter i
JOIN sizes sa ON sa.doc = i.doc_a
JOIN sizes sb ON sb.doc = i.doc_b
WHERE CAST(i.inter AS DOUBLE) / sa.sz >= 0.5
   OR CAST(i.inter AS DOUBLE) / sb.sz >= 0.5
"""


def q_dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard pairs with a LOW stop-shingle cap (max_doc_freq=3) that
    actually drops shingles at the gate SFs (df reaches 7 at sf0.01 / 25
    at sf0.1) — pinning the dropping path end-to-end against a capped
    oracle, where the production-cap queries run with headroom. Lower
    threshold (0.3) so pairs whose estimates the cap shifts stay
    visible."""
    sh = D.shingles(_docs(spark, sf_dir), "doc_id", "text", k=3)
    pairs = D.jaccard_pairs(sh, "doc_id", threshold=0.3, max_doc_freq=3)
    return pairs.select(
        "id_a", "id_b",
        (F.floor(F.col("jaccard") * 1000000) / 1000000).alias("jaccard"),
    )


SQL_DEDUP_JACCARD_CAPPED = _jaccard_pairs_sql(3, 0.3)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL mixed-codec decode driven end-to-end (round 6; WebP VP8L
    added round 9, ANIMATED WebP round 10): deterministic PNG /
    baseline-JPEG / progressive-SOF2-JPEG / GIF / lossless-WebP /
    animated-WebP payloads built per doc
    (multimodal.synthetic_media_payloads), decoded through the Arrow
    extract_frame_features kernel. Every codec is lossless on these
    payloads — the animated entry composites two constant VP8L frames
    (offset sub-rect replacement), so its sampled canvases stay constant
    — and the band feature has the closed form (doc_id%256)/255 the
    DuckDB oracle replays; a decoder regression flips status to 'stub'
    or shifts f0 and the hash check fails."""
    from spdb_spark.functions.multimodal import (
        extract_frame_features,
        synthetic_media_payloads,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    media = synthetic_media_payloads(docs, "doc_id")
    feats = extract_frame_features(media, n_frames=2, dim=4)
    return feats.select(
        "media_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "status",
        (F.floor(F.element_at("feature", 1).cast("double") * 10000) / 10000).alias(
            "f0"
        ),
    )


SQL_MULTIMODAL_DECODE = """
SELECT doc_id AS media_id, f.frame_idx, 'ok' AS status,
       FLOOR(CAST(doc_id % 256 AS DOUBLE) / 255 * 10000) / 10000 AS f0
FROM documents
CROSS JOIN (VALUES (CAST(0 AS BIGINT)), (CAST(1 AS BIGINT))) f(frame_idx)
"""


def q_multimodal_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-only metadata probe driven end-to-end (round 6): per-doc
    payloads across six containers (PNG/JPEG/GIF/BMP/TIFF/WAV,
    probe.synthetic_probe_payloads) probed WITHOUT decoding through the
    Arrow kernel (functions/probe.py). Every probed field has the closed
    form the DuckDB oracle replays; nulls (e.g. image duration, audio
    width) are coalesced to -1 on both sides so the integer columns
    compare exactly. At 100 TB this is the prune-before-decode stage."""
    from spdb_spark.functions.probe import probe_media, synthetic_probe_payloads

    docs = _docs(spark, sf_dir).select("doc_id")
    media = synthetic_probe_payloads(docs, "doc_id")
    probed = probe_media(media)
    neg1 = F.lit(-1).cast("long")
    return probed.select(
        "media_id",
        "container",
        "codec",
        F.coalesce(F.col("width").cast("long"), neg1).alias("width"),
        F.coalesce(F.col("height").cast("long"), neg1).alias("height"),
        F.coalesce(F.col("duration_ms").cast("long"), neg1).alias("duration_ms"),
        F.coalesce(F.col("n_frames").cast("long"), neg1).alias("n_frames"),
        F.coalesce(F.col("sample_rate").cast("long"), neg1).alias("sample_rate"),
        F.coalesce(F.col("channels").cast("long"), neg1).alias("channels"),
    )


SQL_MULTIMODAL_PROBE = """
SELECT doc_id AS media_id,
  CASE doc_id % 6 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
                  WHEN 3 THEN 'bmp' WHEN 4 THEN 'tiff' ELSE 'wav' END
    AS container,
  CASE doc_id % 6 WHEN 0 THEN 'png/gray8' WHEN 1 THEN 'jpeg/baseline'
                  WHEN 2 THEN 'gif' WHEN 3 THEN 'bmp/8'
                  WHEN 4 THEN 'tiff/packbits' ELSE 'wav/pcm16' END AS codec,
  CAST(CASE WHEN doc_id % 6 = 5 THEN -1 ELSE 8 + doc_id % 16 END AS BIGINT)
    AS width,
  CAST(CASE WHEN doc_id % 6 = 5 THEN -1 ELSE 8 + (doc_id // 2) % 8 END
    AS BIGINT) AS height,
  CAST(CASE WHEN doc_id % 6 = 5 THEN 100 + doc_id % 50 ELSE -1 END AS BIGINT)
    AS duration_ms,
  CAST(CASE WHEN doc_id % 6 = 5 THEN 100 + doc_id % 50 ELSE 1 END AS BIGINT)
    AS n_frames,
  CAST(CASE WHEN doc_id % 6 = 5 THEN 1000 ELSE -1 END AS BIGINT)
    AS sample_rate,
  CAST(CASE WHEN doc_id % 6 = 5 THEN 1 ELSE -1 END AS BIGINT) AS channels
FROM documents
"""


def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote kNN label prediction over the embedding table — the
    label-propagation / weak-labeling consumer of the ANN stack
    (similarity.knn_classify; exact neighbors here, IVF neighbors drop
    in at scale via the `neighbors` parameter)."""
    from spdb_spark.functions.similarity import knn_classify

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    return knn_classify(embs, queries, "vec_id", "embedding", "label", k=10)


SQL_KNN_CLASSIFY = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS q_vec
  FROM embeddings WHERE vec_id % 50 = 0
),
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS c_vec, label
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id, label,
         ROUND(list_dot_product(q_vec, c_vec)
               / (sqrt(list_dot_product(q_vec, q_vec))
                  * sqrt(list_dot_product(c_vec, c_vec))), 6) AS cos_sim
  FROM c CROSS JOIN q
  WHERE neighbor_id <> query_id
),
top AS (
  SELECT query_id, label
  FROM scored
  QUALIFY ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) <= 10
),
votes AS (
  SELECT query_id, label, COUNT(*) AS votes FROM top GROUP BY query_id, label
)
SELECT query_id, label AS pred_label, votes
FROM votes
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY query_id ORDER BY votes DESC, label) = 1
"""


SQL_APPROX_VOCAB = f"""
WITH toks AS (
  SELECT lang, unnest({_TOKENS_SQL}) AS tok FROM documents
),
per AS (
  SELECT lang, COUNT(*) AS n_tokens, CAST(1 AS BIGINT) AS within_tol
  FROM toks GROUP BY lang
)
SELECT * FROM per
UNION ALL
SELECT 'ALL' AS lang, COUNT(*) AS n_tokens, CAST(1 AS BIGINT) AS within_tol
FROM toks
"""

QUERIES = {
    "llm_repetition": (q_repetition, SQL_REPETITION),
    "llm_approx_vocab": (q_approx_vocab, SQL_APPROX_VOCAB),
    "llm_exact_substr": (q_exact_substr, SQL_EXACT_SUBSTR),
    "llm_bpe_pairs": (q_bpe_pairs, SQL_BPE_PAIRS),
    "llm_pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "llm_pack_materialize": (q_pack_materialize, SQL_PACK_MATERIALIZE),
    "llm_mixture_plan": (q_mixture_plan, SQL_MIXTURE_PLAN),
    "llm_dedup_keep_best": (q_dedup_keep_best, SQL_DEDUP_KEEP_BEST),
    "llm_pii_redact": (q_pii_redact, SQL_PII_REDACT),
    "llm_dedup_exact": (q_dedup_exact, SQL_DEDUP_EXACT),
    "llm_quality_filter": (q_quality_filter, SQL_QUALITY_FILTER),
    "llm_quality_report": (q_quality_report, SQL_QUALITY_REPORT),
    "llm_tfidf_similar": (q_tfidf_similar, SQL_TFIDF_SIMILAR),
    "llm_bm25_search": (q_bm25_search, SQL_BM25_SEARCH),
    "llm_vocab_topk": (q_vocab_topk, SQL_VOCAB_TOPK),
    "llm_contamination": (q_contamination, SQL_CONTAMINATION),
    "llm_hash_split": (q_hash_split, SQL_HASH_SPLIT),
    "llm_stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "llm_dedup_fingerprint": (q_dedup_fingerprint, SQL_DEDUP_FINGERPRINT),
    "llm_dedup_jaccard": (q_dedup_jaccard, SQL_DEDUP_JACCARD),
    "llm_dedup_minhash": (q_dedup_minhash, SQL_DEDUP_MINHASH),
    "llm_dedup_minhash_shuffle": (q_dedup_minhash_shuffle, SQL_DEDUP_MINHASH),
    "llm_dedup_simhash": (q_simhash, SQL_SIMHASH),
    "llm_text_stats": (q_text_stats, SQL_TEXT_STATS),
    "llm_text_fingerprint": (q_text_fingerprint, SQL_TEXT_FINGERPRINT),
    "llm_text_unigram_logprob": (q_text_unigram_logprob, SQL_TEXT_UNIGRAM_LOGPROB),
    "llm_ann_topk": (q_ann_topk, SQL_ANN_TOPK),
    "llm_dedup_embedding": (q_dedup_embedding, SQL_DEDUP_EMBEDDING),
    "llm_ann_lsh": (q_ann_lsh, SQL_ANN_LSH),
    "llm_dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "llm_dedup_semantic": (q_dedup_semantic, SQL_DEDUP_SEMANTIC),
    "llm_ann_ivf": (q_ann_ivf, SQL_ANN_IVF),
    "llm_multimodal_meta": (q_multimodal_meta, SQL_MULTIMODAL_META),
    "llm_embed_quantize": (q_embed_quantize, SQL_EMBED_QUANTIZE),
    "llm_ann_quantized": (q_ann_quantized, SQL_ANN_QUANTIZED),
    "llm_paragraph_dedup": (q_paragraph_dedup, SQL_PARAGRAPH_DEDUP),
    "llm_corpus_shuffle": (q_corpus_shuffle, SQL_CORPUS_SHUFFLE),
    "llm_curation_pipeline": (q_curation_pipeline, SQL_CURATION_PIPELINE),
    "llm_passage_search": (q_passage_search, SQL_PASSAGE_SEARCH),
    "llm_hybrid_search": (q_hybrid_search, SQL_HYBRID_SEARCH),
    "llm_reservoir_sample": (q_reservoir_sample, SQL_RESERVOIR_SAMPLE),
    "llm_paragraph_provenance": (q_paragraph_provenance, SQL_PARAGRAPH_PROVENANCE),
    "llm_dedup_survivors": (q_dedup_survivors, SQL_DEDUP_SURVIVORS),
    "llm_mixture_apply": (q_mixture_apply, SQL_MIXTURE_APPLY),
    "llm_ngram_novelty": (q_ngram_novelty, SQL_NGRAM_NOVELTY),
    # round-5 additions (appended — the rotation orders never-checked
    # entries first, so these join the 33 existing never-checked rows
    # inside round 5's 50-query driver window)
    "llm_dedup_simhash_pairs": (q_simhash_pairs, SQL_SIMHASH_PAIRS),
    "llm_bigram_logprob": (q_bigram_logprob, SQL_BIGRAM_LOGPROB),
    "llm_embedding_outliers": (q_embedding_outliers, SQL_EMBEDDING_OUTLIERS),
    "llm_text_normalize": (q_text_normalize, SQL_TEXT_NORMALIZE),
    "llm_ann_filtered": (q_ann_filtered, SQL_ANN_FILTERED),
    "llm_bm25_indexed": (q_bm25_indexed, SQL_BM25_SEARCH),
    "llm_dedup_containment": (q_dedup_containment, SQL_DEDUP_CONTAINMENT),
    "llm_knn_classify": (q_knn_classify, SQL_KNN_CLASSIFY),
    "llm_dedup_clusters_incremental": (
        q_dedup_clusters_incremental,
        SQL_DEDUP_CLUSTERS,
    ),
    # --- round-6 additions (append-only: rotation window headroom) ---------
    "llm_dedup_jaccard_capped": (q_dedup_jaccard_capped, SQL_DEDUP_JACCARD_CAPPED),
    "llm_multimodal_decode": (q_multimodal_decode, SQL_MULTIMODAL_DECODE),
    "llm_multimodal_probe": (q_multimodal_probe, SQL_MULTIMODAL_PROBE),
}

# ===========================================================================
# Round-7 gate queries (folded in from suite_staging in round 10; the
# module remains as a re-export shim). Built and oracle-paired during
# round 6, registered since round 7 — suite.py merges STAGED_R7 into the
# registry AFTER the spatial/relational suites, preserving the exact
# rotation order the driver windows were recorded against. Each query
# wraps the fixture corpus in a DETERMINISTIC structure shared
# character-for-character by both engines (chrome around
# documents.text, URL spellings derived from doc_id), so the oracle
# replays the exact operator semantics, not a lookalike.
# ===========================================================================

from spdb_spark.functions.html import html_main_text, main_text_sql
from spdb_spark.functions.quality import (
    gopher_filter,
    gopher_filter_sql,
    gopher_flags_sql,
    gopher_quality_flags,
)
from spdb_spark.functions.url import (
    url_host,
    url_host_sql,
    url_normalize,
    url_normalize_sql,
)

_CHROME_PRE = (
    '<html><body><nav><a href="/">Home</a> <a href="/about">About</a>'
    ' <a href="/contact">Contact</a></nav><p>'
)
_CHROME_POST = (
    '</p><footer><a href="/p">Privacy</a> - <a href="/t">Terms</a>'
    "</footer></body></html>"
)


def q_html_main_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    html = F.concat(F.lit(_CHROME_PRE), F.col("text"), F.lit(_CHROME_POST))
    return _docs(spark, sf_dir).select(
        "doc_id",
        html_main_text(html).alias("main_text"),
        F.length(html_main_text(html)).cast("long").alias("n_chars"),
    )


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


SQL_HTML_MAIN_TEXT = (
    "SELECT doc_id, "
    f"{main_text_sql(f'({_sql_quote(_CHROME_PRE)} || text || {_sql_quote(_CHROME_POST)})')}"
    " AS main_text, "
    f"length({main_text_sql(f'({_sql_quote(_CHROME_PRE)} || text || {_sql_quote(_CHROME_POST)})')})"
    "::BIGINT AS n_chars FROM documents"
)


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    url = F.concat(
        F.lit("HTTP://Example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM:80/Path/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=x&q="),
        (F.col("doc_id") % 13).cast("string"),
        F.lit("#frag"),
    )
    return _docs(spark, sf_dir).select(
        "doc_id",
        url_normalize(url).alias("url_norm"),
        url_host(url).alias("host"),
    )


_URL_SQL = (
    "('HTTP://Example' || (doc_id % 7)::VARCHAR || '.COM:80/Path/' ||"
    " doc_id::VARCHAR || '?utm_source=x&q=' || (doc_id % 13)::VARCHAR || '#frag')"
)

SQL_URL_NORMALIZE = (
    f"SELECT doc_id, {url_normalize_sql(_URL_SQL)} AS url_norm, "
    f"{url_host_sql(_URL_SQL)} AS host FROM documents"
)


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = gopher_quality_flags(F.col("text"))
    return _docs(spark, sf_dir).select(
        "doc_id",
        s["word_count"].alias("word_count"),
        s["mean_word_len"].alias("mean_word_len"),
        s["symbol_ratio"].alias("symbol_ratio"),
        s["alpha_frac"].alias("alpha_frac"),
        s["stop_hits"].alias("stop_hits"),
        s["dup_line_frac"].alias("dup_line_frac"),
        gopher_filter(F.col("text")).alias("passes"),
    )


SQL_GOPHER_QUALITY = (
    f"SELECT doc_id, ({gopher_flags_sql('text')}).word_count AS word_count, "
    f"({gopher_flags_sql('text')}).mean_word_len AS mean_word_len, "
    f"({gopher_flags_sql('text')}).symbol_ratio AS symbol_ratio, "
    f"({gopher_flags_sql('text')}).alpha_frac AS alpha_frac, "
    f"({gopher_flags_sql('text')}).stop_hits AS stop_hits, "
    f"({gopher_flags_sql('text')}).dup_line_frac AS dup_line_frac, "
    f"{gopher_filter_sql('text')} AS passes FROM documents"
)


def q_cap_per_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host document quota (sources/crawl.cap_per_host): 37 synthetic
    hosts derived from doc_id, keep the 5 content-hash-ranked docs per
    host. The kept SET is a pure function of the corpus — the exact
    property the oracle replays."""
    from spdb_spark.sources.crawl import cap_per_host

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("https://host"),
            (F.col("doc_id") % 37).cast("string"),
            F.lit(".example.com/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("source"),
    )
    return cap_per_host(docs, 5, "source").select(
        "doc_id", url_host(F.col("source")).alias("host")
    )


_CAP_URL_SQL = (
    "('https://host' || (doc_id % 37)::VARCHAR || '.example.com/doc/' ||"
    " doc_id::VARCHAR)"
)


def _sql_cap_per_host() -> str:
    from spdb_spark.functions.hashing import md5_long_sql

    host = url_host_sql(_CAP_URL_SQL)
    rank = md5_long_sql("doc_id::VARCHAR")
    return (
        f"WITH u AS (SELECT doc_id, {host} AS host FROM documents), "
        "r AS (SELECT doc_id, host, ROW_NUMBER() OVER ("
        f"PARTITION BY host ORDER BY {rank}, doc_id) AS rk FROM u) "
        "SELECT doc_id, host FROM r WHERE rk <= 5"
    )


SQL_CAP_PER_HOST = _sql_cap_per_host()


def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard export assignment (sources/shards.shard_assignment —
    the expression write_jsonl_shards groups on): per-shard doc count,
    total text chars, and id range for a 16-shard layout."""
    from spdb_spark.sources.shards import shard_assignment

    docs = _docs(spark, sf_dir)
    return (
        docs.withColumn(
            "shard_id", shard_assignment(F.col("doc_id").cast("string"), 16)
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("n_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


def _sql_shard_assignment() -> str:
    from spdb_spark.sources.shards import shard_assignment_sql

    sid = shard_assignment_sql("doc_id::VARCHAR", 16)
    return (
        f"WITH a AS (SELECT doc_id, length(text) AS lc, {sid} AS shard_id"
        " FROM documents) "
        "SELECT shard_id, COUNT(*)::BIGINT AS n_docs, SUM(lc)::BIGINT AS"
        " n_chars, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc"
        " FROM a GROUP BY shard_id"
    )


SQL_SHARD_ASSIGNMENT = _sql_shard_assignment()


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (functions/dsir.py): target = every 10th
    document, raw = the full corpus, 512 hashed unigram+bigram buckets,
    add-one smoothing. Output: per-doc log importance weight (6-dp
    floor-scaled, the suite's float protocol) + gram count."""
    from spdb_spark.functions.dsir import dsir_bucket_logratio, dsir_weights

    docs = _docs(spark, sf_dir)
    target = docs.where(F.col("doc_id") % 10 == 0)
    lr = dsir_bucket_logratio(docs, target, n_buckets=512)
    w = dsir_weights(docs, lr, n_buckets=512)
    return w.select(
        "doc_id",
        (F.floor(F.col("log_weight") * 1000000) / 1000000).alias("log_weight"),
        F.col("n_grams").cast("long").alias("n_grams"),
    )


def _sql_dsir_weights() -> str:
    from spdb_spark.functions.hashing import md5_long_sql

    toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    return f"""
WITH t AS (SELECT doc_id, {toks} AS t FROM documents),
g AS (
  SELECT doc_id, unnest(t) AS gram FROM t
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> concat_ws(' ', t[i], t[i+1]))) AS gram
  FROM t WHERE len(t) >= 2
),
b AS (SELECT doc_id, ({md5_long_sql('gram')} % 512) AS bucket FROM g),
craw AS (SELECT bucket, COUNT(*) AS c_r FROM b GROUP BY bucket),
ctgt AS (SELECT bucket, COUNT(*) AS c_t FROM b WHERE doc_id % 10 = 0
         GROUP BY bucket),
tot AS (SELECT (SELECT COUNT(*) FROM b) AS t_r,
               (SELECT COUNT(*) FROM b WHERE doc_id % 10 = 0) AS t_t),
lr AS (
  SELECT COALESCE(craw.bucket, ctgt.bucket) AS bucket,
         ln((COALESCE(c_t, 0) + 1.0) / (t_t + 512.0))
         - ln((COALESCE(c_r, 0) + 1.0) / (t_r + 512.0)) AS logratio
  FROM craw FULL OUTER JOIN ctgt ON craw.bucket = ctgt.bucket
  CROSS JOIN tot
)
SELECT b.doc_id,
       FLOOR(SUM(lr.logratio) * 1000000) / 1000000 AS log_weight,
       COUNT(*)::BIGINT AS n_grams
FROM b JOIN lr USING (bucket) GROUP BY b.doc_id
"""


SQL_DSIR_WEIGHTS = _sql_dsir_weights()


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: the corpus unigram-LM score
    (the registered llm_text_unigram_logprob gate's exact expression,
    already 6-dp floor-scaled) terciled into head/middle/tail via
    sampling.quantile_buckets (1-row exact-percentile broadcast, no
    corpus shuffle)."""
    from spdb_spark.functions.sampling import quantile_buckets
    scores = q_text_unigram_logprob(spark, sf_dir)
    return quantile_buckets(scores, "mean_logprob").select(
        "doc_id", "mean_logprob", "bucket"
    )


def _sql_ccnet_buckets() -> str:
    p1, p2 = repr(1 / 3), repr(2 / 3)
    return f"""
WITH scores AS ({SQL_TEXT_UNIGRAM_LOGPROB}),
thr AS (SELECT quantile_cont(mean_logprob, [{p1}, {p2}]) AS t FROM scores)
SELECT doc_id, mean_logprob,
       CASE WHEN mean_logprob < t[1] THEN 'tail'
            WHEN mean_logprob < t[2] THEN 'middle'
            ELSE 'head' END AS bucket
FROM scores CROSS JOIN thr
"""


SQL_CCNET_BUCKETS = _sql_ccnet_buckets()


def q_image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs end-to-end (functions/phash.py):
    per-doc lossless payloads with KNOWN duplicate structure (class =
    doc_id % 17, format rotated PNG/QOI/TGA) -> decode -> DCT pHash ->
    banded Hamming pair join. Classes are >= 24 bits apart and same-class
    images are pixel-identical across formats, so the true pair set is
    exactly `id_a % 17 == id_b % 17` at Hamming 0 — the closed form the
    oracle replays. A decoder, hash, or band-join regression breaks it."""
    from spdb_spark.functions.phash import (
        image_phash,
        phash_neardup_pairs,
        synthetic_image_dup_payloads,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    media = synthetic_image_dup_payloads(docs, "doc_id", n_classes=17)
    return phash_neardup_pairs(image_phash(media), max_hamming=3)


SQL_IMAGE_PHASH_PAIRS = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INTEGER) AS hamming
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND a.doc_id % 17 = b.doc_id % 17
"""


def q_audio_afp_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-duplicate pairs end-to-end (functions/afp.py):
    per-doc lossless audio with KNOWN duplicate structure (class melody
    = doc_id % 11, codec alternating WAV/FLAC) -> decode -> band-energy
    fingerprint -> banded Hamming pair join. Classes are >= 11 signature
    bits apart and same-class clips are sample-identical across codecs,
    so the true pair set is exactly `id_a % 11 == id_b % 11` at Hamming
    0 — the closed form the oracle replays."""
    from spdb_spark.functions.afp import (
        audio_fingerprints,
        audio_neardup_pairs,
        synthetic_audio_dup_payloads,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    media = synthetic_audio_dup_payloads(docs, "doc_id", n_classes=11)
    return audio_neardup_pairs(audio_fingerprints(media), max_hamming=3)


SQL_AUDIO_AFP_PAIRS = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INTEGER) AS hamming
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND a.doc_id % 11 = b.doc_id % 11
"""


def q_video_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-duplicate pairs end-to-end (functions/phash.py video
    form): per-doc AVI clips with KNOWN duplicate structure (class clip
    = doc_id % 7, container alternating MPNG/DIB) -> frame-sampled
    pHash -> majority signature -> banded Hamming pair join. Classes
    are >= 19 signature bits apart and same-class clips are
    pixel-identical across containers, so the true pair set is exactly
    `id_a % 7 == id_b % 7` at Hamming 0."""
    from spdb_spark.functions.phash import (
        phash_neardup_pairs,
        synthetic_video_dup_payloads,
        video_phashes,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    media = synthetic_video_dup_payloads(docs, "doc_id", n_classes=7)
    return phash_neardup_pairs(video_phashes(media), max_hamming=3)


SQL_VIDEO_PHASH_PAIRS = """
SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INTEGER) AS hamming
FROM documents a JOIN documents b
  ON a.doc_id < b.doc_id AND a.doc_id % 7 = b.doc_id % 7
"""


STAGED_R7: dict = {
    "llm_html_main_text": (q_html_main_text, SQL_HTML_MAIN_TEXT),
    "llm_url_normalize": (q_url_normalize, SQL_URL_NORMALIZE),
    "llm_gopher_quality": (q_gopher_quality, SQL_GOPHER_QUALITY),
    "llm_cap_per_host": (q_cap_per_host, SQL_CAP_PER_HOST),
    "llm_shard_assignment": (q_shard_assignment, SQL_SHARD_ASSIGNMENT),
    "llm_dsir_weights": (q_dsir_weights, SQL_DSIR_WEIGHTS),
    "llm_ccnet_buckets": (q_ccnet_buckets, SQL_CCNET_BUCKETS),
    "llm_image_phash_pairs": (q_image_phash_pairs, SQL_IMAGE_PHASH_PAIRS),
    "llm_audio_afp_pairs": (q_audio_afp_pairs, SQL_AUDIO_AFP_PAIRS),
    "llm_video_phash_pairs": (q_video_phash_pairs, SQL_VIDEO_PHASH_PAIRS),
}


# ---------------------------------------------------------------------------
# Round-7-built gate queries (same pattern: deterministic chrome shared
# character-for-character with the oracle so DuckDB replays the exact
# operator semantics).
# ---------------------------------------------------------------------------

_C4_LOREM = "lorem ipsum dolor sit amet filler text here."
_C4_BRACE = "var f = function() { return 1; }"


def _c4_page_col() -> "F.Column":
    return F.concat_ws(
        "\n",
        F.concat(
            F.lit("The quick data pipeline processes "),
            F.substring("text", 1, 24),
            F.lit(" now."),
        ),
        F.concat(F.lit("raw fragment "), F.substring("text", 25, 20)),
        F.concat(
            F.lit("Please enable javascript to view item "),
            (F.col("doc_id") % 5).cast("string"),
            F.lit("."),
        ),
        F.lit("We updated our privacy policy for you today."),
        F.concat(
            F.lit("Is the "), F.substring("text", 1, 12), F.lit(" batch correct?")
        ),
        F.lit("Short line here."),
        F.lit("Every shard completes the merge cleanly tonight."),
        F.when(F.col("doc_id") % 3 == 0, F.lit(_C4_LOREM)),
        F.when(F.col("doc_id") % 7 == 0, F.lit(_C4_BRACE)),
    )


def q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 cleaning rules (functions/c4.py) over synthetic multi-line
    pages built from documents.text: per-line terminal-punctuation /
    min-words / javascript / policy-boilerplate filtering, page-level
    lorem-ipsum + curly-brace + min-sentence rules. Line mix per page:
    3 keepers, 1 unpunctuated fragment, 1 javascript line, 1 policy
    line, 1 short line, plus a lorem line on doc_id%3==0 and a brace
    line on doc_id%7==0 — so clean_text, every signal, and the keep bit
    are all discriminative."""
    from spdb_spark.functions.c4 import c4_clean_lines, c4_filter, c4_page_flags

    page = F.col("page")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", _c4_page_col().alias("page"))
        .select(
            "doc_id",
            c4_clean_lines(page).alias("clean_text"),
            c4_page_flags(page).alias("s"),
            c4_filter(page).alias("keep"),
        )
        .select(
            "doc_id",
            "clean_text",
            F.col("s.kept_lines").alias("kept_lines"),
            F.col("s.kept_words").alias("kept_words"),
            F.col("s.n_sentences").alias("n_sentences"),
            F.col("s.has_lorem").alias("has_lorem"),
            F.col("s.has_brace").alias("has_brace"),
            "keep",
        )
    )


def _sql_c4_rules() -> str:
    from spdb_spark.functions.c4 import (
        c4_clean_lines_sql,
        c4_filter_sql,
        c4_page_flags_sql,
    )

    page = (
        "concat_ws(chr(10), "
        "'The quick data pipeline processes ' || substr(text, 1, 24) || ' now.', "
        "'raw fragment ' || substr(text, 25, 20), "
        "'Please enable javascript to view item ' || (doc_id % 5)::VARCHAR || '.', "
        "'We updated our privacy policy for you today.', "
        "'Is the ' || substr(text, 1, 12) || ' batch correct?', "
        "'Short line here.', "
        "'Every shard completes the merge cleanly tonight.', "
        f"CASE WHEN doc_id % 3 = 0 THEN {_sql_quote(_C4_LOREM)} END, "
        f"CASE WHEN doc_id % 7 = 0 THEN {_sql_quote(_C4_BRACE)} END)"
    )
    return f"""
WITH p AS (SELECT doc_id, {page} AS page FROM documents),
t AS (SELECT doc_id, {c4_clean_lines_sql('page')} AS clean_text,
             {c4_page_flags_sql('page')} AS s,
             {c4_filter_sql('page')} AS keep FROM p)
SELECT doc_id, clean_text,
       s.kept_lines AS kept_lines, s.kept_words AS kept_words,
       s.n_sentences AS n_sentences, s.has_lorem AS has_lorem,
       s.has_brace AS has_brace, keep
FROM t
"""


SQL_C4_RULES = _sql_c4_rules()

STAGED_R7["llm_c4_rules"] = (q_c4_rules, SQL_C4_RULES)


def _psl_host_col() -> "F.Column":
    k = (F.col("doc_id") % 23).cast("string")
    m = F.col("doc_id") % 8
    site = F.concat(F.lit("site"), k)
    # m==0 uses the FQDN trailing-dot spelling: eTLD+1 must strip it
    return (
        F.when(m == 0, F.concat(F.lit("www."), site, F.lit(".com.")))
        .when(m == 1, F.concat(F.lit("a.b."), site, F.lit(".co.uk")))
        .when(m == 2, F.concat(site, F.lit(".ck")))
        .when(m == 3, F.concat(F.lit("x."), site, F.lit(".ck")))
        .when(m == 4, F.lit("www.ck"))
        .when(m == 5, F.lit("sub.www.ck"))
        .when(m == 6, F.concat(site, F.lit(".org")))
        .otherwise(F.concat(F.lit("deep."), site, F.lit(".zz")))
    )


def q_registered_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain (eTLD+1) extraction (functions/domains.py):
    synthetic hosts derived from doc_id exercise every public-suffix
    rule class — exact (com/org), multi-label (co.uk), wildcard (*.ck:
    site.ck is itself public), exception (!www.ck beats the wildcard),
    and the implicit default rule (unknown .zz). The corpus side is
    broadcast-joined against the distinct-host domain map, never
    shuffled — the property the plan gate in tests/test_domains.py
    pins."""
    from spdb_spark.functions.domains import host_registered_domains

    d = _docs(spark, sf_dir).select("doc_id", _psl_host_col().alias("host"))
    mapping = host_registered_domains(d.select("host").distinct())
    return d.join(F.broadcast(mapping), "host").select(
        "doc_id", "host", "public_suffix", "domain"
    )


def _sql_registered_domain() -> str:
    from spdb_spark.functions.domains import registered_domain_sql

    host = (
        "CASE doc_id % 8 "
        "WHEN 0 THEN 'www.site' || (doc_id % 23)::VARCHAR || '.com.' "
        "WHEN 1 THEN 'a.b.site' || (doc_id % 23)::VARCHAR || '.co.uk' "
        "WHEN 2 THEN 'site' || (doc_id % 23)::VARCHAR || '.ck' "
        "WHEN 3 THEN 'x.site' || (doc_id % 23)::VARCHAR || '.ck' "
        "WHEN 4 THEN 'www.ck' "
        "WHEN 5 THEN 'sub.www.ck' "
        "WHEN 6 THEN 'site' || (doc_id % 23)::VARCHAR || '.org' "
        "ELSE 'deep.site' || (doc_id % 23)::VARCHAR || '.zz' END"
    )
    rd = registered_domain_sql("(SELECT DISTINCT host FROM d)")
    return f"""
WITH d AS (SELECT doc_id, {host} AS host FROM documents),
rd AS (SELECT * FROM {rd})
SELECT d.doc_id, d.host, rd.public_suffix, rd.domain
FROM d JOIN rd USING (host)
"""


SQL_REGISTERED_DOMAIN = _sql_registered_domain()

STAGED_R7["llm_registered_domain"] = (q_registered_domain, SQL_REGISTERED_DOMAIN)


# ===========================================================================
# Round-10 gate: product quantization with ADC scoring (functions/pq.py)
# ===========================================================================


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC approximate top-k driven end-to-end: deterministic
    md5-picked codebooks (16 codes x 8 subspaces over dim 64), corpus
    encoded to 8 small ints per vector in one zero-exchange projection,
    ADC candidate scan over codes only, exact float re-rank of each
    query's 30 best. The oracle replays the identical protocol: every
    subspace distance is the dot-expansion rounded to 6dp BEFORE
    argmin/summation (rounded terms are 1e-6 multiples, so sums round
    identically in any order)."""
    from spdb_spark.functions.pq import pq_topk

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    return pq_topk(
        embs, queries, dim=64, k=10, m=8, n_codes=16, rerank=30
    )


def _pq_sql(n_codes: int = 16) -> str:
    d2 = (
        "ROUND(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        " + list_dot_product({b}, {b}), 6)"
    )
    return f"""
WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid_src) - 1 AS INTEGER) AS centroid_id,
         c_vec
  FROM (
    SELECT vec_id AS cid_src, v AS c_vec
    FROM base
    ORDER BY {md5_long_sql("CAST(vec_id AS VARCHAR)")}, vec_id
    LIMIT {n_codes}
  )
),
sub AS MATERIALIZED (
  SELECT vec_id, j, v[j*8+1 : j*8+8] AS sv
  FROM base, unnest(range(0, 8)) AS t(j)
),
csub AS MATERIALIZED (
  SELECT centroid_id, j, c_vec[j*8+1 : j*8+8] AS cv
  FROM cents, unnest(range(0, 8)) AS t(j)
),
codes AS MATERIALIZED (
  SELECT vec_id, j, centroid_id AS code FROM (
    SELECT s.vec_id, s.j, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, s.j
             ORDER BY {d2.format(a="s.sv", b="c.cv")}, c.centroid_id
           ) AS rn
    FROM sub s JOIN csub c ON s.j = c.j
  ) WHERE rn = 1
),
lut AS MATERIALIZED (
  SELECT s.vec_id AS query_id, c.j, c.centroid_id,
         {d2.format(a="s.sv", b="c.cv")} AS d
  FROM sub s JOIN csub c ON s.j = c.j
  WHERE s.vec_id % 50 = 0
),
adc AS (
  SELECT l.query_id, co.vec_id AS neighbor_id, ROUND(SUM(l.d), 6) AS adc
  FROM codes co
  JOIN lut l ON l.j = co.j AND l.centroid_id = co.code
  WHERE co.vec_id <> l.query_id
  GROUP BY l.query_id, co.vec_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT adc.*,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY adc, neighbor_id
           ) AS rn
    FROM adc
  ) WHERE rn <= 30
),
exact AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
  FROM cand
  JOIN base q ON q.vec_id = cand.query_id
  JOIN base c ON c.vec_id = cand.neighbor_id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS BIGINT) AS "rank"
  FROM exact
) WHERE "rank" <= 10
"""


SQL_ANN_PQ = _pq_sql()


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite (faiss-style) driven end-to-end: cosine coarse
    quantizer (16 lists, probe 4), residual PQ (16 codes x 8 subspaces),
    per-(query, probed-list) residual LUTs, ADC over probed lists only,
    exact re-rank of the 30 best. The oracle composes the gated IVF
    quantizer fragment with the PQ distance protocol over residuals."""
    from spdb_spark.functions.pq import ivfpq_topk

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    return ivfpq_topk(
        embs, queries, dim=64, k=10,
        n_centroids=16, n_probe=4, m=8, n_codes=16, rerank=30,
    )


def _ivfpq_sql() -> str:
    d2 = (
        "ROUND(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
        " + list_dot_product({b}, {b}), 6)"
    )
    return f"""
WITH {_ivf_quantizer_sql(16)},
lists0 AS MATERIALIZED (
  SELECT a.vec_id AS neighbor_id, a.centroid_id,
         list_transform(range(1, 65), i -> a.v[i] - c.c_vec[i]) AS resid
  FROM assigned a JOIN cents c USING (centroid_id)
  WHERE a.crank = 1
),
pcents AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY cid_src) - 1 AS INTEGER) AS pq_id,
         p_vec
  FROM (
    SELECT neighbor_id AS cid_src, resid AS p_vec
    FROM lists0
    ORDER BY {md5_long_sql("CAST(neighbor_id AS VARCHAR)")}, neighbor_id
    LIMIT 16
  )
),
psub AS MATERIALIZED (
  SELECT pq_id, j, p_vec[j*8+1 : j*8+8] AS pv
  FROM pcents, unnest(range(0, 8)) AS t(j)
),
rsub AS MATERIALIZED (
  SELECT neighbor_id, centroid_id, j, resid[j*8+1 : j*8+8] AS rv
  FROM lists0, unnest(range(0, 8)) AS t(j)
),
codes AS MATERIALIZED (
  SELECT neighbor_id, centroid_id, j, pq_id AS code FROM (
    SELECT r.neighbor_id, r.centroid_id, r.j, p.pq_id,
           ROW_NUMBER() OVER (
             PARTITION BY r.neighbor_id, r.j
             ORDER BY {d2.format(a="r.rv", b="p.pv")}, p.pq_id
           ) AS rn
    FROM rsub r JOIN psub p ON r.j = p.j
  ) WHERE rn = 1
),
probes AS MATERIALIZED (
  SELECT a.vec_id AS query_id, a.centroid_id,
         list_transform(range(1, 65), i -> a.v[i] - c.c_vec[i]) AS qresid
  FROM assigned a JOIN cents c USING (centroid_id)
  WHERE a.crank <= 4 AND a.vec_id % 50 = 0
),
lut AS MATERIALIZED (
  SELECT q.query_id, q.centroid_id, p.j, p.pq_id,
         {d2.format(a="q.qresid[p.j*8+1 : p.j*8+8]", b="p.pv")} AS d
  FROM probes q JOIN psub p ON TRUE
),
adc AS (
  SELECT l.query_id, co.neighbor_id, ROUND(SUM(l.d), 6) AS adc
  FROM codes co
  JOIN lut l ON l.centroid_id = co.centroid_id
            AND l.j = co.j AND l.pq_id = co.code
  WHERE co.neighbor_id <> l.query_id
  GROUP BY l.query_id, co.neighbor_id
),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT adc.*,
           ROW_NUMBER() OVER (
             PARTITION BY query_id ORDER BY adc, neighbor_id
           ) AS rn
    FROM adc
  ) WHERE rn <= 30
),
exact AS (
  SELECT cand.query_id, cand.neighbor_id,
         ROUND(list_dot_product(q.v, c.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(c.v, c.v))), 6) AS cos_sim
  FROM cand
  JOIN base q ON q.vec_id = cand.query_id
  JOIN base c ON c.vec_id = cand.neighbor_id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, cos_sim,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id
         ) AS BIGINT) AS "rank"
  FROM exact
) WHERE "rank" <= 10
"""


SQL_ANN_IVFPQ = _ivfpq_sql()

STAGED_R10_LLM: dict = {
    "llm_ann_pq": (q_ann_pq, SQL_ANN_PQ),
    "llm_ann_ivfpq": (q_ann_ivfpq, SQL_ANN_IVFPQ),
}


# ===========================================================================
# Round-11 gates: 8-bit PQ via the Arrow encode engine, and the IVF-PQ
# incremental-append path gated against the SAME oracle as a full build
# ===========================================================================


def q_ann_pq256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-bit product quantization — the billion-scale code budget
    (n_codes=256 is what faiss-style deployments store, one byte per
    subspace): same PQ-ADC + exact re-rank pipeline as `llm_ann_pq`, but
    encoded through the ARROW engine (pq.py), whose plan is constant-size
    in n_codes. The expression engine measured a 73 s plan-build at 256
    codes (SCALE.md r10) — this gate is that ceiling converted into a
    closed capability. Oracle: the identical protocol SQL with a
    256-vector codebook pick (engines are bit-identical by construction
    AND test-pinned, so one oracle serves both)."""
    from spdb_spark.functions.pq import pq_topk

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    return pq_topk(
        embs, queries, dim=64, k=10, m=8, n_codes=256, rerank=30,
        engine="arrow",
    )


SQL_ANN_PQ256 = _pq_sql(256)


def q_ann_ivfpq_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF-PQ maintenance lifecycle under the full-build oracle:
    train the quantizer on the corpus (frozen), persist an index over
    3/4 of the vectors, APPEND the remaining 1/4 as a batch
    (append_to_ivfpq_index — O(batch), staged exactly-once), COMPACT +
    VACUUM the code partitions, then query through the pruned indexed
    path. Because appending under a frozen quantizer is bit-identical
    to a rebuild with the same quantizer, the gate shares
    `llm_ann_ivfpq`'s oracle verbatim — the driver comparison IS the
    append==rebuild proof at both SFs.

    The result is collected and re-created as a local DataFrame because
    the index lives in a temp dir removed before return (bounded: k
    rows per query at gate SF)."""
    import os
    import shutil
    import tempfile

    from spdb_spark.functions.ivf import assign_lists, choose_centroids
    from spdb_spark.functions.pq import (
        append_to_ivfpq_index,
        compact_ivfpq_index,
        ivfpq_topk_indexed,
        pq_codebooks,
        save_ivfpq_index,
        vacuum_ivfpq_index,
    )

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    cents = choose_centroids(embs, "vec_id", "embedding", 16)
    cents = spark.createDataFrame(
        [(int(r.centroid_id), list(r.centroid_vec)) for r in cents.collect()],
        schema="centroid_id int, centroid_vec array<double>",
    )
    lists = (
        assign_lists(embs, cents, "vec_id", "embedding", n_probe=1)
        .join(F.broadcast(cents), "centroid_id")
        .select(
            "vid",
            "centroid_id",
            F.zip_with(
                F.col("v"), F.col("centroid_vec"), lambda a, b: a - b
            ).alias("resid"),
        )
    )
    cbs = pq_codebooks(lists, "vid", "resid", dim=64, m=8, n_codes=16)
    tmp = tempfile.mkdtemp(prefix="ivfpqidx-")
    try:
        idx = os.path.join(tmp, "idx")
        save_ivfpq_index(
            embs.where(F.col("vec_id") % 4 != 0), idx, dim=64,
            cents=cents, codebooks=cbs,
        )
        append_to_ivfpq_index(
            spark, idx, embs.where(F.col("vec_id") % 4 == 0), dim=64,
            batch_id="gate",
        )
        compact_ivfpq_index(spark, idx)
        vacuum_ivfpq_index(idx)
        res = ivfpq_topk_indexed(
            spark, idx, queries, embs, dim=64, k=10, n_probe=4, rerank=30
        )
        rows, schema = res.collect(), res.schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def q_dedup_semantic_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming semantic dedup (streaming/semdedup.py) gated against
    the SAME oracle as the batch gate `llm_dedup_semantic`: the corpus
    streams in three micro-batches (split by vec_id hash-thirds through
    a real readStream, one file per trigger) into the foreachBatch sink
    under the FROZEN k=16 quantizer the oracle replays; the accumulated
    pair set must equal the batch pipeline on the union — the driver
    comparison IS the stream==batch proof at both SFs (any arrival
    order; the reversed-order pin lives in tests/test_streaming_semdedup).

    The result is collected and re-created as a local DataFrame because
    the sink state lives in a temp dir removed before return (bounded:
    the tau-surviving pair set at gate SF)."""
    import os
    import shutil
    import tempfile

    from spdb_spark.functions.ivf import choose_centroids
    from spdb_spark.streaming.semdedup import StreamingSemanticDedup

    embs = _embs(spark, sf_dir)
    c = choose_centroids(embs, "vec_id", "embedding", 16)
    cents = spark.createDataFrame(
        [(int(r.centroid_id), list(r.centroid_vec)) for r in c.collect()],
        schema="centroid_id int, centroid_vec array<double>",
    )
    tmp = tempfile.mkdtemp(prefix="semstream-")
    q = None
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        for i in range(3):
            embs.where(F.crc32(F.col("vec_id").cast("string")) % 3 == i).coalesce(
                1
            ).write.parquet(os.path.join(src, f"p{i}"))
        sink = StreamingSemanticDedup(
            spark, os.path.join(tmp, "state"), cents, tau=_COS_TAU, n_probe=3
        )
        stream = (
            spark.readStream.schema(embs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q = sink.start(stream, os.path.join(tmp, "ckpt"), availableNow=True)
        if not q.awaitTermination(600):
            raise TimeoutError("semantic dedup stream did not finish in 600s")
        res = sink.pairs().select("id_a", "id_b", "cos_sim")
        rows, schema = res.collect(), res.schema
    finally:
        if q is not None:
            q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def q_ann_ivfpq_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StreamingVectorIndex driven end-to-end under the full-build
    oracle: the quantizer trains on the corpus (frozen — the offline
    step of every streaming-ANN deployment), the index bootstraps over
    half the vectors, the other half arrives through a REAL readStream
    (two files, one per micro-batch, foreachBatch appends via the
    staged exactly-once protocol), and the query runs through the
    pruned indexed path. Because streamed appends under a frozen
    quantizer are bit-identical to a rebuild, the gate shares
    `llm_ann_ivfpq`'s oracle verbatim — the driver comparison is the
    stream==batch proof at both SFs.

    The result is collected and re-created as a local DataFrame because
    the index lives in a temp dir removed before return."""
    import os
    import shutil
    import tempfile

    from spdb_spark.functions.ivf import assign_lists, choose_centroids
    from spdb_spark.functions.pq import pq_codebooks, save_ivfpq_index
    from spdb_spark.streaming.vectorindex import StreamingVectorIndex

    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % 50 == 0)
    cents = choose_centroids(embs, "vec_id", "embedding", 16)
    cents = spark.createDataFrame(
        [(int(r.centroid_id), list(r.centroid_vec)) for r in cents.collect()],
        schema="centroid_id int, centroid_vec array<double>",
    )
    lists = (
        assign_lists(embs, cents, "vec_id", "embedding", n_probe=1)
        .join(F.broadcast(cents), "centroid_id")
        .select(
            "vid",
            "centroid_id",
            F.zip_with(
                F.col("v"), F.col("centroid_vec"), lambda a, b: a - b
            ).alias("resid"),
        )
    )
    cbs = pq_codebooks(lists, "vid", "resid", dim=64, m=8, n_codes=16)
    tmp = tempfile.mkdtemp(prefix="ivfpqstream-")
    q = None
    try:
        idx = os.path.join(tmp, "idx")
        save_ivfpq_index(
            embs.where(F.col("vec_id") % 4 < 2), idx, dim=64,
            cents=cents, codebooks=cbs,
        )
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        for i, part in enumerate((2, 3)):
            embs.where(F.col("vec_id") % 4 == part).coalesce(1).write.parquet(
                os.path.join(src, f"p{i}")
            )
        sink = StreamingVectorIndex(spark, idx, kind="ivfpq", dim=64)
        stream = (
            spark.readStream.schema(embs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q = sink.start(stream, os.path.join(tmp, "ckpt"), availableNow=True)
        if not q.awaitTermination(600):
            raise TimeoutError("vector-index stream did not finish in 600s")
        res = sink.topk(queries, embs, k=10, n_probe=4, rerank=30)
        rows, schema = res.collect(), res.schema
    finally:
        if q is not None:
            q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def q_ann_ivfpq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search on the persisted IVF-PQ index (pq.py
    `where=` — the faiss IDSelector shape: the predicate pushes down on
    the CORPUS scan and the matching-id set semi-joins the probed
    codes): k=25 against ~10%-selective metadata (label = 6) with one
    probed list leaves every query short of k, so each escalates to
    exact brute force over the filtered corpus — the same
    full-escalation contract (and therefore the same oracle) as the IVF
    gate `llm_ann_filtered`. The partial-escalation semantics are
    pinned in tests/test_pq_arrow.py."""
    import os

    from spdb_spark.functions.pq import ivfpq_topk_indexed, save_ivfpq_index

    embs = _embs(spark, sf_dir)
    path = _cache_dir(sf_dir, "ivfpq_plain")
    if not os.path.exists(os.path.join(path, "centroids", "_SUCCESS")):
        save_ivfpq_index(embs, path, dim=64, n_centroids=16, m=8, n_codes=16)
    queries = embs.where(F.col("vec_id") % 100 == 0)
    return ivfpq_topk_indexed(
        spark, path, queries, embs, dim=64, k=25, n_probe=1, rerank=30,
        where="label = 6",
    )


_TFR_SHARDS = 16


def q_tfrecord_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TFRecord export round-trip: documents grouped into synthetic
    shards (one TFRecord stream of tf.train.Examples per group, built
    by the dependency-free proto encoder in sources/tfrecord.py), then
    walked back through the REAL CRC-verified record scanner and
    Example decoder. Decoded id / text-md5 / byte length / in-shard
    position are pure functions of the corpus, so the oracle replays
    them without touching TFRecord at all — the gate proves the whole
    encode -> frame -> CRC -> parse -> decode chain is lossless,
    distributed, and deterministic (the zipshard-gate pattern)."""
    import pandas as pd

    from spdb_spark.sources.tfrecord import tfrecord_members

    docs = _docs(spark, sf_dir).withColumn(
        "shard_id", (F.col("doc_id") % _TFR_SHARDS).cast("int")
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        from spdb_spark.sources.tfrecord import (
            tf_example_encode,
            tfrecord_encode,
        )

        sid = int(pdf["shard_id"].iloc[0])
        pdf = pdf.sort_values("doc_id")
        payloads = [
            tf_example_encode(
                {"doc_id": [int(i)], "text": [str(t).encode("utf-8")]}
            )
            for i, t in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame(
            [(f"mem://shard-{sid:04d}.tfrecord", tfrecord_encode(payloads))],
            columns=["path", "content"],
        )

    raw = docs.groupBy("shard_id").applyInPandas(
        build, "path string, content binary"
    )
    members = tfrecord_members(raw)

    def decode(pdfs):
        import hashlib

        from spdb_spark.sources.tfrecord import tf_example_decode

        for pdf in pdfs:
            ids, nb, md5s = [], [], []
            for payload in pdf["payload"]:
                feats = tf_example_decode(bytes(payload))
                text = bytes(feats["text"][0])
                ids.append(int(feats["doc_id"][0]))
                nb.append(len(text))
                md5s.append(hashlib.md5(text).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "rec_index": pdf["rec_index"].astype("int64"),
                    "n_text_bytes": pd.Series(nb, dtype="int64"),
                    "text_md5": md5s,
                    "shard": pdf["shard"],
                }
            )

    return members.mapInPandas(
        decode,
        "doc_id long, rec_index long, n_text_bytes long, "
        "text_md5 string, shard string",
    )


SQL_TFRECORD_EXPORT = f"""
SELECT doc_id,
       ROW_NUMBER() OVER (PARTITION BY doc_id % {_TFR_SHARDS}
                          ORDER BY doc_id) - 1 AS rec_index,
       strlen(text)::BIGINT AS n_text_bytes,
       md5(text) AS text_md5,
       'mem://shard-' || lpad((doc_id % {_TFR_SHARDS})::VARCHAR, 4, '0')
         || '.tfrecord' AS shard
FROM documents
"""


_BLOOM_M, _BLOOM_K = 600, 3


def q_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom filter (functions/membership.py): build the
    bitmap over every third document's text, probe the whole corpus,
    report maybe-member beside exact membership. The filter is sized
    SMALL (600 bits / 3 hashes over ~170 keys, ~56% fill) so real
    false positives flow through both engines — the oracle replays the
    full double-hash + 60-bit-word protocol, proving the engine
    computes Bloom semantics, not exact membership."""
    from spdb_spark.functions.membership import bloom_build, bloom_probe

    docs = _docs(spark, sf_dir)
    bloom = bloom_build(
        docs.where(F.col("doc_id") % 3 == 0), "text", _BLOOM_M, _BLOOM_K
    )
    probed = bloom_probe(
        docs.select("doc_id", "text"), "text", bloom, _BLOOM_M, _BLOOM_K
    )
    return probed.select(
        "doc_id",
        F.col("maybe_member").cast("long").alias("maybe_member"),
        (F.col("doc_id") % 3 == 0).cast("long").alias("is_member"),
    )


def _sql_bloom_membership() -> str:
    from spdb_spark.functions.membership import bloom_positions_sql

    positions = bloom_positions_sql("text", _BLOOM_M, _BLOOM_K)
    mask = "(CAST(1 AS BIGINT) << CAST(pos % 60 AS INTEGER))"
    return f"""
WITH pos AS (
  SELECT doc_id, unnest({positions}) AS pos FROM documents
),
bloom AS (
  SELECT pos // 60 AS word_idx, bit_or({mask}) AS bits
  FROM pos WHERE doc_id % 3 = 0 GROUP BY 1
),
probe AS (
  SELECT p.doc_id,
         bool_and(b.bits IS NOT NULL AND (b.bits & {mask.replace('pos', 'p.pos')})
                    = {mask.replace('pos', 'p.pos')}) AS maybe
  FROM pos p LEFT JOIN bloom b ON p.pos // 60 = b.word_idx
  GROUP BY p.doc_id
)
SELECT doc_id, CAST(maybe AS BIGINT) AS maybe_member,
       CAST(doc_id % 3 = 0 AS BIGINT) AS is_member
FROM probe
"""


SQL_BLOOM_MEMBERSHIP = _sql_bloom_membership()


def q_bloom_membership_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Bloom accumulation (streaming/bloom.py) gated against
    the SAME oracle as the batch gate `llm_bloom_membership`: the member
    docs (doc_id % 3 == 0) arrive in three micro-batches through a real
    readStream (hash-thirds, one file per trigger) and fold into the
    persisted bitmap; probing the whole corpus must then equal the
    one-shot batch filter — the driver comparison IS the stream==batch
    proof (bit_or is a monoid, so arrival order is immaterial; the
    redelivery/compaction pins live in tests/test_streaming_bloom)."""
    import os
    import shutil
    import tempfile

    from spdb_spark.streaming.bloom import StreamingBloomFilter

    docs = _docs(spark, sf_dir)
    members = docs.where(F.col("doc_id") % 3 == 0)
    tmp = tempfile.mkdtemp(prefix="bloomstream-")
    q = None
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        feed = members.select("doc_id", "text")
        for i in range(3):
            feed.where(
                F.crc32(F.col("doc_id").cast("string")) % 3 == i
            ).coalesce(1).write.parquet(os.path.join(src, f"p{i}"))
        sink = StreamingBloomFilter(
            spark, os.path.join(tmp, "state"), _BLOOM_M, _BLOOM_K,
            key_col="text",
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q = sink.start(stream, os.path.join(tmp, "ckpt"), availableNow=True)
        if not q.awaitTermination(600):
            raise TimeoutError("bloom stream did not finish in 600s")
        res = sink.probe(docs.select("doc_id", "text"), "text").select(
            "doc_id",
            F.col("maybe_member").cast("long").alias("maybe_member"),
            (F.col("doc_id") % 3 == 0).cast("long").alias("is_member"),
        )
        rows, schema = res.collect(), res.schema
    finally:
        if q is not None:
            q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


_CM_W, _CM_D = 32, 2


def q_countmin_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters (functions/sketch.py): sketch the
    token stream into 2x32 integer cells, then estimate every distinct
    token's frequency and report the top-100 by estimate beside the
    true count. The sketch is deliberately narrow (32 buckets against
    the fixture's 31-token vocabulary) so collisions force REAL
    overestimates through both engines — the oracle replays the full
    hash/sum/min protocol, proving count-min semantics, not exact
    counting. All-integer arithmetic: no float protocol at all."""
    from spdb_spark.functions.sketch import countmin_build, countmin_estimate

    docs = _docs(spark, sf_dir)
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    sketch = countmin_build(toks, "tok", _CM_W, _CM_D)
    true = toks.groupBy("tok").agg(F.count("*").alias("true_cnt"))
    est = countmin_estimate(true, "tok", sketch, _CM_W, _CM_D)
    return (
        est.orderBy(F.col("est").desc(), "tok")
        .limit(100)
        .select("tok", "est", "true_cnt")
    )


SQL_COUNTMIN_VOCAB = f"""
WITH toks AS MATERIALIZED (
  SELECT unnest({_TOKENS_SQL}) AS tok FROM documents
),
pos AS MATERIALIZED (
  SELECT tok, r.range AS row,
         (CAST(('0x' || substr(md5(CAST(r.range AS VARCHAR) || ':' || tok),
                               1, 15)) AS BIGINT) % {_CM_W}) AS bucket
  FROM toks CROSS JOIN range(0, {_CM_D}) r
),
sketch AS (SELECT row, bucket, COUNT(*) AS cnt FROM pos GROUP BY 1, 2),
true_c AS (SELECT tok, COUNT(*) AS true_cnt FROM toks GROUP BY tok),
est AS (
  SELECT t.tok, MIN(s.cnt) AS est
  FROM (SELECT DISTINCT tok, row, bucket FROM pos) t
  JOIN sketch s USING (row, bucket)
  GROUP BY t.tok
)
SELECT t.tok, e.est, t.true_cnt
FROM true_c t JOIN est e USING (tok)
ORDER BY e.est DESC, t.tok LIMIT 100
"""


def q_countmin_vocab_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming count-min accumulation (streaming/sketch.py) gated
    against the SAME oracle as the batch gate `llm_countmin_vocab`: the
    token stream arrives in three micro-batches (doc-hash thirds
    through a real readStream) and SUMS into the persisted cells —
    unlike Bloom's bit_or, the fold is not idempotent, so this gate is
    also the driver-level witness that the ledger's exactly-once
    machinery (not the operation's algebra) is what prevents
    double-counting. Estimating every distinct token then equals the
    one-shot batch sketch — the driver comparison IS the stream==batch
    proof."""
    import os
    import shutil
    import tempfile

    from spdb_spark.streaming.sketch import StreamingCountMin

    docs = _docs(spark, sf_dir)
    toks_all = docs.select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    tmp = tempfile.mkdtemp(prefix="cmstream-")
    q = None
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        for i in range(3):
            toks_all.where(
                F.crc32(F.col("doc_id").cast("string")) % 3 == i
            ).select("tok").coalesce(1).write.parquet(
                os.path.join(src, f"p{i}")
            )
        sink = StreamingCountMin(
            spark, os.path.join(tmp, "state"), _CM_W, _CM_D, key_col="tok"
        )
        stream = (
            spark.readStream.schema("tok string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q = sink.start(stream, os.path.join(tmp, "ckpt"), availableNow=True)
        if not q.awaitTermination(600):
            raise TimeoutError("count-min stream did not finish in 600s")
        true = toks_all.groupBy("tok").agg(F.count("*").alias("true_cnt"))
        res = (
            sink.estimate(true, "tok")
            .orderBy(F.col("est").desc(), "tok")
            .limit(100)
            .select("tok", "est", "true_cnt")
        )
        rows, schema = res.collect(), res.schema
    finally:
        if q is not None:
            q.stop()
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(rows, schema)


def q_kn_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney trigram LM (functions/ngramlm.py) — the
    real CCNet-family quality signal, one order past llm_bigram_logprob
    and with the smoothing the published CommonCrawl filters actually
    use. Per-trigram log-probabilities quantize to micro-nat BIGINTs
    before the per-doc mean, so the aggregate is integer arithmetic —
    order-independent across engines (tighter than the bigram gate's
    float AVG). The oracle replays the identical count algebra and
    expression shape."""
    from spdb_spark.functions.ngramlm import kn_trigram_logprob

    return kn_trigram_logprob(_docs(spark, sf_dir))


SQL_KN_TRIGRAM = f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, {_TOKENS_SQL} AS t FROM documents
),
grams AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g
  FROM t WHERE len(t) >= 3
),
tri AS MATERIALIZED (SELECT g, COUNT(*) AS c3 FROM grams GROUP BY g),
trik AS MATERIALIZED (
  SELECT g, c3,
         split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS uv,
         split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS vw,
         split_part(g, ' ', 2) AS v,
         split_part(g, ' ', 3) AS w
  FROM tri
),
ctx AS (SELECT uv, CAST(SUM(c3) AS BIGINT) AS c2ctx, COUNT(*) AS t3
        FROM trik GROUP BY uv),
cont2 AS MATERIALIZED (SELECT vw, COUNT(*) AS n2cont FROM trik GROUP BY vw),
mid AS (SELECT v, COUNT(*) AS n2ctx, COUNT(DISTINCT w) AS t2
        FROM trik GROUP BY v),
cont1 AS MATERIALIZED (
  SELECT split_part(vw, ' ', 2) AS w, COUNT(*) AS n1cont
  FROM cont2 GROUP BY 1
),
totals AS (
  SELECT (SELECT COUNT(*) FROM cont2) AS n2types,
         (SELECT COUNT(*) FROM cont1) AS t1,
         (SELECT COUNT(DISTINCT tok)
          FROM (SELECT unnest(t) AS tok FROM t WHERE len(t) >= 3)) AS v_size
),
s AS (
  SELECT doc_id, g,
         split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS uv,
         split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS vw,
         split_part(g, ' ', 2) AS v,
         split_part(g, ' ', 3) AS w
  FROM grams
),
scored AS (
  SELECT s.doc_id,
         CAST(FLOOR(LN(
           GREATEST(c3 - 0.75, 0.0) / c2ctx
           + 0.75 * t3 / c2ctx * (
               GREATEST(n2cont - 0.75, 0.0) / n2ctx
               + 0.75 * t2 / n2ctx * (
                   GREATEST(n1cont - 0.75, 0.0) / n2types
                   + 0.75 * t1 / n2types / v_size
               )
           )
         ) * 1e6) AS BIGINT) AS lpq
  FROM s
  JOIN tri USING (g) JOIN ctx USING (uv) JOIN mid USING (v)
  JOIN cont2 USING (vw) JOIN cont1 USING (w)
  CROSS JOIN totals
)
SELECT doc_id,
       FLOOR(CAST(SUM(lpq) AS DOUBLE) / COUNT(*)) / 1e6 AS mean_logprob,
       COUNT(*) AS n_trigrams
FROM scored GROUP BY doc_id
"""


def q_kn_score_frozen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen-model KN scoring (ngramlm.kn_model + kn_score) — the
    CCNet deployment shape: the LM trains on HALF the corpus (even
    doc_ids) and scores ALL documents: the even half exercises the
    bit-identical seen path and the held-out half drives 7.5k
    unseen-trigram discount-interpolation rows at sf0.001 (the
    fixture's 31-token vocabulary leaves no unseen CONTEXTS, so the
    alpha = 0.4 stupid-backoff CASE levels — Brants et al. 2007 — are
    replayed by the oracle but fire only in the toy-corpus pytest,
    tests/test_ngramlm_frozen.py). The oracle replays training-on-half,
    the LEFT joins, and the CASE ladder with the identical expression
    shape."""
    from spdb_spark.functions.ngramlm import kn_model, kn_score

    docs = _docs(spark, sf_dir)
    model = kn_model(docs.where(F.col("doc_id") % 2 == 0))
    return kn_score(docs, model)


_KN_P1_BACKOFF = (
    "(GREATEST(COALESCE(n1cont, 0) - 0.75, 0.0) / n2types"
    " + 0.75 * t1 / n2types / v_size)"
)
_KN_P2_BACKOFF = (
    f"(CASE WHEN n2ctx IS NULL THEN 0.4 * {_KN_P1_BACKOFF}"
    f" ELSE GREATEST(COALESCE(n2cont, 0) - 0.75, 0.0) / n2ctx"
    f" + 0.75 * t2 / n2ctx * {_KN_P1_BACKOFF} END)"
)
_KN_P3_BACKOFF = (
    f"(CASE WHEN c2ctx IS NULL THEN 0.4 * {_KN_P2_BACKOFF}"
    f" ELSE GREATEST(COALESCE(c3, 0) - 0.75, 0.0) / c2ctx"
    f" + 0.75 * t3 / c2ctx * {_KN_P2_BACKOFF} END)"
)

SQL_KN_SCORE_FROZEN = f"""
WITH traint AS MATERIALIZED (
  SELECT doc_id, {_TOKENS_SQL} AS t FROM documents WHERE doc_id % 2 = 0
),
traingrams AS MATERIALIZED (
  SELECT unnest(list_transform(range(1, len(t) - 1),
                i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g
  FROM traint WHERE len(t) >= 3
),
tri AS MATERIALIZED (SELECT g, COUNT(*) AS c3 FROM traingrams GROUP BY g),
trik AS MATERIALIZED (
  SELECT g, c3,
         split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS uv,
         split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS vw,
         split_part(g, ' ', 2) AS v,
         split_part(g, ' ', 3) AS w
  FROM tri
),
ctx AS (SELECT uv, CAST(SUM(c3) AS BIGINT) AS c2ctx, COUNT(*) AS t3
        FROM trik GROUP BY uv),
cont2 AS MATERIALIZED (SELECT vw, COUNT(*) AS n2cont FROM trik GROUP BY vw),
mid AS (SELECT v, COUNT(*) AS n2ctx, COUNT(DISTINCT w) AS t2
        FROM trik GROUP BY v),
cont1 AS MATERIALIZED (
  SELECT split_part(vw, ' ', 2) AS w, COUNT(*) AS n1cont
  FROM cont2 GROUP BY 1
),
totals AS (
  SELECT (SELECT COUNT(*) FROM cont2) AS n2types,
         (SELECT COUNT(*) FROM cont1) AS t1,
         (SELECT COUNT(DISTINCT tok)
          FROM (SELECT unnest(t) AS tok FROM traint WHERE len(t) >= 3))
           AS v_size
),
s AS (
  SELECT doc_id, g,
         split_part(g, ' ', 1) || ' ' || split_part(g, ' ', 2) AS uv,
         split_part(g, ' ', 2) || ' ' || split_part(g, ' ', 3) AS vw,
         split_part(g, ' ', 2) AS v,
         split_part(g, ' ', 3) AS w
  FROM (
    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS g
    FROM (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)
    WHERE len(t) >= 3
  )
),
scored AS (
  SELECT s.doc_id,
         CAST(FLOOR(LN({_KN_P3_BACKOFF}) * 1e6) AS BIGINT) AS lpq
  FROM s
  LEFT JOIN tri USING (g) LEFT JOIN ctx USING (uv)
  LEFT JOIN mid USING (v) LEFT JOIN cont2 USING (vw)
  LEFT JOIN cont1 USING (w)
  CROSS JOIN totals
)
SELECT doc_id,
       FLOOR(CAST(SUM(lpq) AS DOUBLE) / COUNT(*)) / 1e6 AS mean_logprob,
       COUNT(*) AS n_trigrams
FROM scored GROUP BY doc_id
"""


def q_kn5_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-5 interpolated Kneser-Ney (ngramlm.kn_ngram_logprob) — the
    model order the published CommonCrawl filters actually score with
    (CCNet's KenLM 5-gram). Same micro-nat integer protocol as the
    trigram gate; the generalized recursion is independently pinned
    bit-equal to the hand-rolled trigram at n=3 in pytest, and this
    oracle replays all five levels of the suffix-type/continuation
    algebra with identical expression shapes."""
    from spdb_spark.functions.ngramlm import kn_ngram_logprob

    return kn_ngram_logprob(_docs(spark, sf_dir), 5)


def _sql_kn_ngram(n: int) -> str:
    def parts(expr: str, lo: int, hi: int) -> str:
        return " || ' ' || ".join(
            f"split_part({expr}, ' ', {i})" for i in range(lo, hi + 1)
        )

    gram_list = (
        f"list_transform(range(1, len(t) - {n - 2}), "
        f"i -> concat_ws(' ', {', '.join(f't[i+{j}]' for j in range(n))}))"
    )
    ctes = [
        f"t AS MATERIALIZED (SELECT doc_id, {_TOKENS_SQL} AS t FROM documents)",
        f"""grams AS MATERIALIZED (
  SELECT doc_id, unnest({gram_list}) AS g
  FROM t WHERE len(t) >= {n}
)""",
        f"t{n} AS MATERIALIZED (SELECT g, COUNT(*) AS cn FROM grams GROUP BY g)",
        f"""ctx{n} AS (
  SELECT {parts('g', 1, n - 1)} AS p,
         CAST(SUM(cn) AS BIGINT) AS ctxsum, COUNT(*) AS tdistn
  FROM t{n} GROUP BY 1
)""",
    ]
    prev_key, prev_tokens = "g", n
    for k in range(n - 1, 0, -1):
        src = f"t{n}" if prev_tokens == n else f"t{prev_tokens}"
        ctes.append(
            f"""t{k} AS MATERIALIZED (
  SELECT {parts(prev_key, prev_tokens - k + 1, prev_tokens)} AS s{k},
         COUNT(*) AS nc{k}
  FROM {src} GROUP BY 1
)"""
        )
        prev_key, prev_tokens = f"s{k}", k
    for k in range(n - 1, 1, -1):
        ctes.append(
            f"""ctx{k} AS (
  SELECT {parts(f's{k}', 1, k - 1)} AS m{k},
         CAST(SUM(nc{k}) AS BIGINT) AS denom{k}, COUNT(*) AS tdist{k}
  FROM t{k} GROUP BY 1
)"""
        )
    ctes.append(
        f"""totals AS (
  SELECT (SELECT COUNT(*) FROM t2) AS denom1,
         (SELECT COUNT(*) FROM t1) AS t1total,
         (SELECT COUNT(DISTINCT tok)
          FROM (SELECT unnest(t) AS tok FROM t WHERE len(t) >= {n}))
           AS v_size
)"""
    )
    s_cols = [f"{parts('g', 1, n - 1)} AS p"]
    s_cols += [f"{parts('g', n - k + 1, n)} AS s{k}" for k in range(1, n)]
    s_cols += [f"{parts('g', n - k + 1, n - 1)} AS m{k}" for k in range(2, n)]
    ctes.append(
        "s AS (SELECT doc_id, g, " + ", ".join(s_cols) + " FROM grams)"
    )
    expr = (
        "GREATEST(nc1 - 0.75, 0.0) / denom1"
        " + 0.75 * t1total / denom1 / v_size"
    )
    for k in range(2, n):
        expr = (
            f"GREATEST(nc{k} - 0.75, 0.0) / denom{k}"
            f" + 0.75 * tdist{k} / denom{k} * ({expr})"
        )
    expr = (
        f"GREATEST(cn - 0.75, 0.0) / ctxsum"
        f" + 0.75 * tdistn / ctxsum * ({expr})"
    )
    joins = [f"JOIN t{n} USING (g)", f"JOIN ctx{n} USING (p)"]
    joins += [f"JOIN t{k} USING (s{k})" for k in range(1, n)]
    joins += [f"JOIN ctx{k} USING (m{k})" for k in range(2, n)]
    ctes.append(
        f"""scored AS (
  SELECT s.doc_id, CAST(FLOOR(LN({expr}) * 1e6) AS BIGINT) AS lpq
  FROM s {' '.join(joins)} CROSS JOIN totals
)"""
    )
    return (
        "WITH " + ",\n".join(ctes) + """
SELECT doc_id,
       FLOOR(CAST(SUM(lpq) AS DOUBLE) / COUNT(*)) / 1e6 AS mean_logprob,
       COUNT(*) AS n_ngrams
FROM scored GROUP BY doc_id
"""
    )


SQL_KN5 = _sql_kn_ngram(5)


_PR_LINKS, _PR_ITERS = 3, 5


def q_host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-graph PageRank (functions/graph.py) — the crawl-
    prioritization quality prior (Common Crawl publishes host-level
    link ranks; curation pipelines consume them beside eTLD+1). The
    fixture link graph is deterministic: each document cites 3 target
    documents picked by md5, collapsed to weighted source->source host
    edges. Ranks are exact BIGINT micro-units (integer contributions,
    floor divisions), so the oracle — 5 unrolled join+groupBy
    iterations — matches bit-for-bit with no float protocol."""
    from spdb_spark.functions.graph import pagerank
    from spdb_spark.functions.hashing import md5_long

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    n = docs.agg(F.count("*").alias("_nd"))
    targets = [
        (
            md5_long(
                F.concat_ws(
                    ":", F.col("doc_id").cast("string"), F.lit(str(i))
                )
            )
            % F.col("_nd")
        ).alias(f"t{i}")
        for i in range(_PR_LINKS)
    ]
    links = (
        docs.crossJoin(F.broadcast(n))
        .select("source", F.explode(F.array(*targets)).alias("target_doc"))
    )
    edges = links.join(
        docs.select(
            F.col("doc_id").alias("target_doc"), F.col("source").alias("dst")
        ),
        "target_doc",
    ).select(F.col("source").alias("src"), "dst")
    pr = pagerank(edges, "src", "dst", iterations=_PR_ITERS)
    return pr.select(F.col("node").alias("host"), "rank_q")


def _sql_host_pagerank() -> str:
    from spdb_spark.functions.hashing import md5_long_sql

    tgt = md5_long_sql(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(i.range AS VARCHAR)"
    )
    prev = "r0"
    its = []
    for k in range(1, _PR_ITERS + 1):
        its.append(
            f"""it{k} AS (
  SELECT n.node,
         CAST((SELECT t FROM tele)
              + (85 * COALESCE(s.sm, 0)) // 100 AS BIGINT) AS rq
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, SUM((r.rq * e.w) // o.od) AS sm
    FROM edges e JOIN {prev} r ON e.src = r.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) s USING (node)
)"""
        )
        prev = f"it{k}"
    iters_sql = ",\n".join(its)
    return f"""
WITH docs AS MATERIALIZED (SELECT doc_id, source FROM documents),
nd AS (SELECT COUNT(*) AS nd FROM docs),
links AS (
  SELECT d.source AS src, ({tgt} % (SELECT nd FROM nd)) AS target_doc
  FROM docs d CROSS JOIN range(0, {_PR_LINKS}) i
),
edges AS MATERIALIZED (
  SELECT l.src, t.source AS dst, COUNT(*) AS w
  FROM links l JOIN docs t ON l.target_doc = t.doc_id
  GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
),
nn AS (SELECT COUNT(*) AS nn FROM nodes),
outdeg AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS od
                        FROM edges GROUP BY src),
r0 AS (SELECT node,
              CAST(1000000000 // (SELECT nn FROM nn) AS BIGINT) AS rq
       FROM nodes),
tele AS (SELECT CAST(15000000000 // (100 * (SELECT nn FROM nn)) AS BIGINT)
           AS t),
{iters_sql}
SELECT node AS host, rq AS rank_q FROM it{_PR_ITERS}
"""


SQL_HOST_PAGERANK = _sql_host_pagerank()


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall harmonic centrality (functions/graph.py hyperball —
    Boldi & Vigna 2013, the algorithm behind Common Crawl's published
    harmonic host ranks) over the SAME md5-derived host link graph as
    llm_host_pagerank: per-host HLL counters (16 registers, integer
    trailing-zero ranks) grow by register-wise MAX along edges; the
    neighbourhood function estimates per round and harmonic centrality
    accumulates clamped per-distance increments. All register state and
    HLL sums are integers; the only floats are per-node scalar
    estimator arithmetic on exact integers, floored at 1e-6. The
    oracle unrolls all 5 iterations — the verified substance is the
    full register algebra (indices, ranks, maxes, integer HLL sums)
    matching bit-exactly; the fixture host graph is near-complete so
    estimates saturate at distance 1 (2 distinct harmonic values at
    sf0.001) — distance-varying behavior is pinned on the pytest line
    graph (tests/test_graph.py)."""
    from spdb_spark.functions.graph import hyperball
    from spdb_spark.functions.hashing import md5_long

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    n = docs.agg(F.count("*").alias("_nd"))
    targets = [
        (
            md5_long(
                F.concat_ws(
                    ":", F.col("doc_id").cast("string"), F.lit(str(i))
                )
            )
            % F.col("_nd")
        ).alias(f"t{i}")
        for i in range(_PR_LINKS)
    ]
    links = docs.crossJoin(F.broadcast(n)).select(
        "source", F.explode(F.array(*targets)).alias("target_doc")
    )
    edges = links.join(
        docs.select(
            F.col("doc_id").alias("target_doc"), F.col("source").alias("dst")
        ),
        "target_doc",
    ).select(F.col("source").alias("src"), "dst")
    hb = hyperball(edges, "src", "dst", p=4, iterations=_PR_ITERS)
    return hb.select(F.col("node").alias("host"), "reach", "harmonic")


def _sql_harmonic(n_iters: int = 5, p: int = 4) -> str:
    from spdb_spark.functions.hashing import md5_long_sql

    m = 1 << p
    w = 50
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    # e-notation forces DuckDB to parse these as DOUBLE (a plain decimal
    # literal becomes DECIMAL and the product overflows DECIMAL(18));
    # 17 significant digits round-trip the exact double
    a_lit = f"{alpha * m * m:.17e}"
    b_lit = f"{float(1 << (w + 1)):.17e}"
    tgt = md5_long_sql(
        "CAST(doc_id AS VARCHAR) || ':' || CAST(i.range AS VARCHAR)"
    )
    jref = md5_long_sql("'reg:' || node")
    href = md5_long_sql("'rho:' || node")
    est_body = f"""
  SELECT node,
         CASE WHEN ({m} - nnz) > 0
                   AND ({a_lit} * {b_lit}
                        / (({m} - nnz) * CAST({1 << (w + 1)} AS BIGINT) + zp))
                       <= {2.5 * m}
              THEN {float(m)} * LN({float(m)} / ({m} - nnz))
              ELSE {a_lit} * {b_lit}
                   / (({m} - nnz) * CAST({1 << (w + 1)} AS BIGINT) + zp)
         END AS est
  FROM (SELECT node, COUNT(*) AS nnz,
               CAST(SUM(CAST(1 AS BIGINT)
                        << CAST({w + 1} - rho AS INTEGER)) AS BIGINT) AS zp
        FROM {{src}} GROUP BY node)"""
    ctes = [
        "docs AS MATERIALIZED (SELECT doc_id, source FROM documents)",
        "nd AS (SELECT COUNT(*) AS nd FROM docs)",
        f"""links AS (
  SELECT d.source AS src, ({tgt} % (SELECT nd FROM nd)) AS target_doc
  FROM docs d CROSS JOIN range(0, {_PR_LINKS}) i
)""",
        """edges AS MATERIALIZED (
  SELECT DISTINCT l.src, t.source AS dst
  FROM links l JOIN docs t ON l.target_doc = t.doc_id
)""",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT node FROM (
    SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
  )
)""",
        f"""r0 AS MATERIALIZED (
  SELECT node, ({jref} % {m}) AS j,
         CASE WHEN ({href} % {1 << w}) = 0 THEN {w + 1}
              ELSE bit_count((({href} % {1 << w})
                              & -({href} % {1 << w})) - 1) + 1
         END AS rho
  FROM nodes
)""",
        f"e0 AS ({est_body.format(src='r0')})",
    ]
    for t in range(1, n_iters + 1):
        ctes.append(
            f"""r{t} AS MATERIALIZED (
  SELECT node, j, MAX(rho) AS rho FROM (
    SELECT node, j, rho FROM r{t - 1}
    UNION ALL
    SELECT e.dst AS node, r.j, r.rho
    FROM edges e JOIN r{t - 1} r ON e.src = r.node
  ) GROUP BY node, j
)"""
        )
        ctes.append(f"e{t} AS ({est_body.format(src=f'r{t}')})")
    harm = "0.0"
    for t in range(1, n_iters + 1):
        harm = f"({harm} + GREATEST(e{t}.est - e{t - 1}.est, 0.0) / {t})"
    joins = " ".join(
        f"JOIN e{t} ON e{t}.node = e0.node" for t in range(1, n_iters + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT e0.node AS host,
       FLOOR(e{n_iters}.est * 1e6) / 1e6 AS reach,
       FLOOR({harm} * 1e6) / 1e6 AS harmonic
FROM e0 {joins}
"""
    )


SQL_HARMONIC = _sql_harmonic(_PR_ITERS)


STAGED_R11_LLM: dict = {
    "llm_ann_pq256": (q_ann_pq256, SQL_ANN_PQ256),
    "llm_ann_ivfpq_appended": (q_ann_ivfpq_appended, SQL_ANN_IVFPQ),
    "llm_dedup_semantic_stream": (q_dedup_semantic_stream, SQL_DEDUP_SEMANTIC),
    "llm_ann_ivfpq_stream": (q_ann_ivfpq_stream, SQL_ANN_IVFPQ),
    "llm_ann_ivfpq_filtered": (q_ann_ivfpq_filtered, SQL_ANN_FILTERED),
    "llm_tfrecord_export": (q_tfrecord_export, SQL_TFRECORD_EXPORT),
    "llm_bloom_membership": (q_bloom_membership, SQL_BLOOM_MEMBERSHIP),
    "llm_kn_logprob": (q_kn_logprob, SQL_KN_TRIGRAM),
    "llm_bloom_membership_stream": (
        q_bloom_membership_stream,
        SQL_BLOOM_MEMBERSHIP,
    ),
    "llm_countmin_vocab": (q_countmin_vocab, SQL_COUNTMIN_VOCAB),
    "llm_countmin_vocab_stream": (
        q_countmin_vocab_stream,
        SQL_COUNTMIN_VOCAB,
    ),
    "llm_kn_score_frozen": (q_kn_score_frozen, SQL_KN_SCORE_FROZEN),
    "llm_host_pagerank": (q_host_pagerank, SQL_HOST_PAGERANK),
    "llm_kn5_logprob": (q_kn5_logprob, SQL_KN5),
    "llm_harmonic_centrality": (q_harmonic_centrality, SQL_HARMONIC),
}


# ---------------------------------------------------------------------------
# Round 12: unigram-LM subword tokenizer (functions/unigram.py). The
# gate fixture builds three words per doc from closed-form substrings
# of repeating-alphabet templates (heavy shared substructure, so the
# substring vocabulary is discriminative), trains the seed vocabulary
# (integer micro-nat scores) on that word stream, and Viterbi-encodes
# every doc. The oracle replays the ENTIRE path in SQL: substring
# counts -> kept vocab -> logp_q -> a 6-position unrolled DP with the
# exact (score DESC, n_pieces ASC, seg ASC) tie order of
# unigram._viterbi. EM refinement is float forward-backward (not SQL-
# replayable) and is pinned in tests/test_unigram.py instead:
# likelihood monotonicity, byte-identical re-runs, train/apply
# round-trip.
# ---------------------------------------------------------------------------

_UNI_T1 = "abcdeabcdeab"
_UNI_T2 = "aabbccddee"
_UNI_L = 3  # max piece length
_UNI_TOP = 12  # kept multi-char pieces
_UNI_MAXW = 6  # longest fixture word -> DP unroll depth


def _unigram_fixture_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.expr(
            f"substr('{_UNI_T1}', cast(doc_id % 5 as int) + 1,"
            " 4 + cast(doc_id % 3 as int))"
        ).alias("w1"),
        F.expr(
            f"substr('{_UNI_T2}', cast(doc_id % 4 as int) + 1,"
            " 3 + cast(doc_id % 4 as int))"
        ).alias("w2"),
        F.expr(
            f"substr('{_UNI_T1}', cast(doc_id % 7 as int) + 1, 5)"
        ).alias("w3"),
    )


def q_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spdb_spark.functions.unigram import (
        unigram_seed_vocab,
        unigram_tokenize,
        word_freqs,
    )

    w = _unigram_fixture_words(spark, sf_dir)
    docs = w.select(
        "doc_id", F.concat_ws(" ", "w1", "w2", "w3").alias("text")
    )
    vocab = unigram_seed_vocab(
        word_freqs(docs), max_piece_len=_UNI_L, keep_top=_UNI_TOP
    )
    out = unigram_tokenize(docs, "doc_id", "text", vocab, _UNI_L)
    return out.select(
        "doc_id", F.array_join("pieces", " ").alias("pieces"), "n_pieces"
    )


def _sql_unigram_tokenize() -> str:
    fixture = (
        f"SELECT doc_id,\n"
        f"  substr('{_UNI_T1}', (doc_id % 5)::INT + 1,"
        f" 4 + (doc_id % 3)::INT) AS w1,\n"
        f"  substr('{_UNI_T2}', (doc_id % 4)::INT + 1,"
        f" 3 + (doc_id % 4)::INT) AS w2,\n"
        f"  substr('{_UNI_T1}', (doc_id % 7)::INT + 1, 5) AS w3\n"
        f"FROM documents"
    )
    dps = []
    for j in range(1, _UNI_MAXW + 1):
        cands = []
        for l in range(1, min(_UNI_L, j) + 1):
            piece = f"substr(p.word, {j - l + 1}, {l})"
            if l == 1:
                cands.append(
                    f"SELECT p.word, p.score + coalesce(v.lq,"
                    f" -30000000) AS score, p.np + 1 AS np,\n"
                    f"    (CASE WHEN p.seg = '' THEN '' ELSE p.seg ||"
                    f" ' ' END) || {piece} AS seg\n"
                    f"  FROM dp{j - l} p LEFT JOIN vocab v"
                    f" ON v.piece = {piece}\n"
                    f"  WHERE length(p.word) >= {j}"
                )
            else:
                cands.append(
                    f"SELECT p.word, p.score + v.lq AS score,"
                    f" p.np + 1 AS np,\n"
                    f"    (CASE WHEN p.seg = '' THEN '' ELSE p.seg ||"
                    f" ' ' END) || {piece} AS seg\n"
                    f"  FROM dp{j - l} p JOIN vocab v"
                    f" ON v.piece = {piece}\n"
                    f"  WHERE length(p.word) >= {j}"
                )
        union = "\n  UNION ALL\n".join(cands)
        dps.append(
            f"dp{j} AS (\n"
            f"  SELECT word, score, np, seg FROM (\n"
            f"    SELECT c.*, row_number() OVER (PARTITION BY word\n"
            f"      ORDER BY score DESC, np, seg) AS rk\n"
            f"    FROM (\n{union}\n    ) c\n"
            f"  ) WHERE rk = 1\n)"
        )
    dp_sql = ",\n".join(dps)
    fins = "\n  UNION ALL ".join(
        f"SELECT word, np, seg FROM dp{j} WHERE length(word) = {j}"
        for j in range(1, _UNI_MAXW + 1)
    )
    return f"""
WITH d AS ({fixture}),
wf AS (
  SELECT word, COUNT(*)::BIGINT AS freq FROM (
    SELECT w1 AS word FROM d
    UNION ALL SELECT w2 FROM d
    UNION ALL SELECT w3 FROM d
  ) GROUP BY word
),
subs AS (
  SELECT substr(word, i.i::INT, l.l::INT) AS piece, freq
  FROM wf, range(1, {_UNI_MAXW + 1}) i(i), range(1, {_UNI_L + 1}) l(l)
  WHERE i.i <= length(word)
    AND l.l <= least({_UNI_L}, length(word) - i.i + 1)
),
cnts AS (SELECT piece, SUM(freq) AS cnt FROM subs GROUP BY piece),
keep AS (
  SELECT piece, cnt FROM cnts WHERE length(piece) = 1
  UNION ALL
  SELECT piece, cnt FROM (
    SELECT piece, cnt,
           row_number() OVER (ORDER BY cnt DESC, piece) AS rk
    FROM cnts WHERE length(piece) > 1
  ) WHERE rk <= {_UNI_TOP}
),
tot AS (SELECT SUM(cnt) AS t FROM keep),
vocab AS (
  SELECT piece,
         CAST(FLOOR(ln(cnt::DOUBLE / (SELECT t FROM tot)) * 1000000)
              AS BIGINT) AS lq
  FROM keep
),
words AS (SELECT DISTINCT word FROM wf),
dp0 AS (SELECT word, 0::BIGINT AS score, 0 AS np, '' AS seg FROM words),
{dp_sql},
fin AS (
  {fins}
)
SELECT d.doc_id,
       f1.seg || ' ' || f2.seg || ' ' || f3.seg AS pieces,
       (f1.np + f2.np + f3.np)::INT AS n_pieces
FROM d
JOIN fin f1 ON f1.word = d.w1
JOIN fin f2 ON f2.word = d.w2
JOIN fin f3 ON f3.word = d.w3
"""


SQL_UNIGRAM_TOKENIZE = _sql_unigram_tokenize()


STAGED_R12_LLM: dict = {
    "llm_unigram_tokenize": (q_unigram_tokenize, SQL_UNIGRAM_TOKENIZE),
}


# ---------------------------------------------------------------------------
# Round 12: streaming graph maintenance (streaming/graph.py). The same
# md5-derived citation edges as llm_host_pagerank / llm_harmonic_
# centrality arrive in three micro-batches through a real readStream;
# the sink accumulates per-batch weighted edge slices (sum-monoid +
# ledger exactly-once, the count-min posture) and the rank reads
# recompute the integer-protocol algorithms over the accumulated
# graph. Each stream gate registers the SAME oracle as its batch twin,
# so the driver comparison IS the stream==batch proof for any arrival
# order.
# ---------------------------------------------------------------------------


def _pr_edges_with_row_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The llm_host_pagerank fixture edge multiset, with (doc_id, i)
    retained so the stream gates can split rows into batches
    deterministically."""
    from spdb_spark.functions.hashing import md5_long

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    n = docs.agg(F.count("*").alias("_nd"))
    targets = [
        (
            md5_long(
                F.concat_ws(
                    ":", F.col("doc_id").cast("string"), F.lit(str(i))
                )
            )
            % F.col("_nd")
        ).alias(f"t{i}")
        for i in range(_PR_LINKS)
    ]
    links = docs.crossJoin(F.broadcast(n)).select(
        "doc_id",
        "source",
        F.posexplode(F.array(*targets)).alias("i", "target_doc"),
    )
    return links.join(
        docs.select(
            F.col("doc_id").alias("target_doc"), F.col("source").alias("dst")
        ),
        "target_doc",
    ).select("doc_id", "i", F.col("source").alias("src"), "dst")


def _run_graph_stream(spark: SparkSession, sf_dir: str):
    """Feed the fixture edges through StreamingHostGraph in three
    hash-split micro-batches; yields the live sink (caller reads ranks
    before the temp state is removed)."""
    import os
    import shutil
    import tempfile

    from spdb_spark.streaming.graph import StreamingHostGraph

    edges = _pr_edges_with_row_ids(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="graphstream-")
    q = None
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        for b in range(3):
            edges.where(
                F.crc32(
                    F.concat_ws(":", F.col("doc_id").cast("string"), "i")
                )
                % 3
                == b
            ).select("src", "dst").coalesce(1).write.parquet(
                os.path.join(src, f"p{b}")
            )
        sink = StreamingHostGraph(spark, os.path.join(tmp, "state"))
        stream = (
            spark.readStream.schema("src string, dst string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(src, "*"))
        )
        q = sink.start(stream, os.path.join(tmp, "ckpt"), availableNow=True)
        if not q.awaitTermination(600):
            raise TimeoutError("graph stream did not finish in 600s")
        yield sink
    finally:
        if q is not None:
            q.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def q_host_pagerank_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming edge accumulation -> exact T-iteration PageRank ==
    the batch gate's oracle (SQL_HOST_PAGERANK), bit-for-bit."""
    for sink in _run_graph_stream(spark, sf_dir):
        res = sink.pagerank_ranks(_PR_ITERS).select(
            F.col("node").alias("host"), "rank_q"
        )
        rows, schema = res.collect(), res.schema
    return spark.createDataFrame(rows, schema)


def q_harmonic_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming edge accumulation -> HyperBall harmonic centrality ==
    the batch gate's oracle (SQL_HARMONIC): the register algebra is a
    max-monoid over the accumulated DISTINCT edges, so multiplicity
    and arrival order are irrelevant by construction."""
    for sink in _run_graph_stream(spark, sf_dir):
        res = sink.harmonic_ranks(p=4, iterations=_PR_ITERS).select(
            F.col("node").alias("host"), "reach", "harmonic"
        )
        rows, schema = res.collect(), res.schema
    return spark.createDataFrame(rows, schema)


STAGED_R12_LLM["llm_host_pagerank_stream"] = (
    q_host_pagerank_stream,
    SQL_HOST_PAGERANK,
)
STAGED_R12_LLM["llm_harmonic_stream"] = (q_harmonic_stream, SQL_HARMONIC)


# ---------------------------------------------------------------------------
# Round 12: WordPiece tokenizer gate — the same closed-form word
# fixture as llm_unigram_tokenize, but the vocabulary is POSITIONAL
# (plain at word start, ##-prefixed elsewhere, the BERT convention)
# and encoding is greedy longest-match-first. The oracle replays seed
# construction and the greedy loop as a step-unrolled SQL program
# (max 6 steps: fixture words are <= 6 chars, min piece 1 char);
# [UNK] semantics and training are pytest-pinned (test_wordpiece.py).
# ---------------------------------------------------------------------------


def q_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spdb_spark.functions.unigram import word_freqs
    from spdb_spark.functions.wordpiece import (
        wordpiece_seed_vocab,
        wordpiece_tokenize,
    )

    w = _unigram_fixture_words(spark, sf_dir)
    docs = w.select(
        "doc_id", F.concat_ws(" ", "w1", "w2", "w3").alias("text")
    )
    vocab = wordpiece_seed_vocab(
        word_freqs(docs), max_piece_len=_UNI_L, keep_top=_UNI_TOP
    )
    out = wordpiece_tokenize(docs, "doc_id", "text", vocab, _UNI_L)
    return out.select(
        "doc_id", F.array_join("pieces", " ").alias("pieces"), "n_pieces"
    )


def _sql_wordpiece_tokenize() -> str:
    fixture = (
        f"SELECT doc_id,\n"
        f"  substr('{_UNI_T1}', (doc_id % 5)::INT + 1,"
        f" 4 + (doc_id % 3)::INT) AS w1,\n"
        f"  substr('{_UNI_T2}', (doc_id % 4)::INT + 1,"
        f" 3 + (doc_id % 4)::INT) AS w2,\n"
        f"  substr('{_UNI_T1}', (doc_id % 7)::INT + 1, 5) AS w3\n"
        f"FROM documents"
    )
    steps = []
    for k in range(1, _UNI_MAXW + 1):
        steps.append(
            f"""st{k} AS (
  SELECT word,
         CASE WHEN pos >= length(word) OR dead OR bestl IS NULL
              THEN pos ELSE pos + bestl END AS pos,
         CASE WHEN pos >= length(word) OR dead OR bestl IS NULL THEN seg
              ELSE (CASE WHEN seg = '' THEN '' ELSE seg || ' ' END) ||
                   (CASE WHEN pos = 0 THEN substr(word, 1, bestl::INT)
                         ELSE '##' || substr(word, pos + 1, bestl::INT)
                    END)
         END AS seg,
         CASE WHEN pos >= length(word) OR dead OR bestl IS NULL
              THEN np ELSE np + 1 END AS np,
         dead OR (pos < length(word) AND bestl IS NULL) AS dead
  FROM (
    SELECT s.*,
           (SELECT max(l.l)
            FROM range(1, {_UNI_L + 1}) l(l) JOIN vset v
              ON l.l <= length(s.word) - s.pos
             AND v.piece = CASE WHEN s.pos = 0
                    THEN substr(s.word, 1, l.l::INT)
                    ELSE '##' || substr(s.word, s.pos + 1, l.l::INT) END
           ) AS bestl
    FROM st{k - 1} s
  )
)"""
        )
    steps_sql = ",\n".join(steps)
    return f"""
WITH d AS ({fixture}),
wf AS (
  SELECT word, COUNT(*)::BIGINT AS freq FROM (
    SELECT w1 AS word FROM d
    UNION ALL SELECT w2 FROM d
    UNION ALL SELECT w3 FROM d
  ) GROUP BY word
),
subs AS (
  SELECT CASE WHEN i.i = 1 THEN substr(word, i.i::INT, l.l::INT)
              ELSE '##' || substr(word, i.i::INT, l.l::INT) END AS piece,
         freq
  FROM wf, range(1, {_UNI_MAXW + 1}) i(i), range(1, {_UNI_L + 1}) l(l)
  WHERE i.i <= length(word)
    AND l.l <= least({_UNI_L}, length(word) - i.i + 1)
),
cnts AS (SELECT piece, SUM(freq) AS cnt FROM subs GROUP BY piece),
keep AS (
  SELECT piece FROM cnts
  WHERE length(regexp_replace(piece, '^##', '')) = 1
  UNION ALL
  SELECT piece FROM (
    SELECT piece,
           row_number() OVER (ORDER BY cnt DESC, piece) AS rk
    FROM cnts WHERE length(regexp_replace(piece, '^##', '')) > 1
  ) WHERE rk <= {_UNI_TOP}
),
vset AS (SELECT piece FROM keep),
words AS (SELECT DISTINCT word FROM wf),
st0 AS (SELECT word, 0 AS pos, '' AS seg, 0 AS np, FALSE AS dead
        FROM words),
{steps_sql},
fin AS (
  SELECT word,
         CASE WHEN dead THEN '[UNK]' ELSE seg END AS seg,
         CASE WHEN dead THEN 1 ELSE np END AS np
  FROM st{_UNI_MAXW}
)
SELECT d.doc_id,
       f1.seg || ' ' || f2.seg || ' ' || f3.seg AS pieces,
       (f1.np + f2.np + f3.np)::INT AS n_pieces
FROM d
JOIN fin f1 ON f1.word = d.w1
JOIN fin f2 ON f2.word = d.w2
JOIN fin f3 ON f3.word = d.w3
"""


SQL_WORDPIECE_TOKENIZE = _sql_wordpiece_tokenize()


STAGED_R12_LLM["llm_wordpiece_tokenize"] = (
    q_wordpiece_tokenize,
    SQL_WORDPIECE_TOKENIZE,
)


# ---------------------------------------------------------------------------
# Round 12: Unicode script profiling (functions/scripts.py). Fixture
# text mixes three doc_id-selected alphabet segments (Latin chrome + two
# rotating scripts with varying repeat counts) so every script class
# appears and dominance flips across docs; the oracle replays the
# shared \x{...} codepoint-class counts, ratio floors, and the
# struct-argmax dominant-script rule.
# ---------------------------------------------------------------------------

_SCR_ALPHABETS = (
    "abcdefgh",       # latin
    "абвгдежз",       # cyrillic
    "αβγδεζηθ",       # greek
    "مرحبابال",       # arabic
    "אבגדהוזח",       # hebrew
    "अआइईउऊएऐ",       # devanagari
    "中文字词语文本写",  # cjk
    "ひらがなカタカナ",  # kana
    "한국어텍스트글자",  # hangul
)


def _scr_text_col() -> F.Column:
    d = F.col("doc_id")
    lat = F.expr(
        "repeat(substring('abcdefgh', cast(doc_id % 8 as int) + 1, 1),"
        " 2 + cast(doc_id % 4 as int))"
    )
    segs = [lat]
    for j, mult in ((1, 3), (2, 7)):
        pick = [
            F.when(
                (d * mult + j) % 9 == i,
                F.expr(
                    f"repeat(substring('{a}',"
                    f" cast(doc_id % {len(a)} as int) + 1, 1),"
                    f" {2 + j} + cast(doc_id % 5 as int))"
                ),
            )
            for i, a in enumerate(_SCR_ALPHABETS)
        ]
        segs.append(F.coalesce(*pick))
    return F.concat_ws(" ", *segs)


def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spdb_spark.functions.scripts import script_profile

    return script_profile(
        _docs(spark, sf_dir),
        _scr_text_col(),
        ratios=("latin", "cyrillic", "cjk", "arabic"),
    )


def _sql_script_profile() -> str:
    from spdb_spark.functions.scripts import (
        dominant_script_sql,
        script_ratio_sql,
    )

    lat = (
        "repeat(substring('abcdefgh', (doc_id % 8)::INT + 1, 1),"
        " 2 + (doc_id % 4)::INT)"
    )
    segs = [lat]
    for j, mult in ((1, 3), (2, 7)):
        branches = " ".join(
            f"WHEN (doc_id * {mult} + {j}) % 9 = {i} THEN"
            f" repeat(substring('{a}', (doc_id % {len(a)})::INT + 1, 1),"
            f" {2 + j} + (doc_id % 5)::INT)"
            for i, a in enumerate(_SCR_ALPHABETS)
        )
        segs.append(f"(CASE {branches} END)")
    text = " || ' ' || ".join(segs)
    return f"""
WITH t AS (SELECT doc_id, {text} AS txt FROM documents)
SELECT doc_id,
       {dominant_script_sql("txt")} AS dominant,
       {script_ratio_sql("txt", "latin")} AS latin_q,
       {script_ratio_sql("txt", "cyrillic")} AS cyrillic_q,
       {script_ratio_sql("txt", "cjk")} AS cjk_q,
       {script_ratio_sql("txt", "arabic")} AS arabic_q
FROM t
"""


SQL_SCRIPT_PROFILE = _sql_script_profile()


STAGED_R12_LLM["llm_script_profile"] = (q_script_profile, SQL_SCRIPT_PROFILE)
