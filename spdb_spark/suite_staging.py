"""Round-7 gate queries — REGISTERED as of round 7.

Built and oracle-paired during round 6 but held out of the registry so
the r6 rotation window could land `llm_approx_vocab`'s final
driver-green row (never-checked entries rotate first and would have
pushed it out). Registration lives in suite.py (it merges STAGED into
the master registry — twelve entries: the ten r6-built gates plus
`llm_c4_rules` and `llm_registered_domain`, added mid-round-7); merging
there rather than into suite_llm.QUERIES avoids a circular import
(this module imports suite_llm at module level). This module remains
the implementation home; the exact driver-gate comparison (row count +
schema + column-sorted value hash) lives in tests/test_suite_staging.py.

Each query wraps the fixture corpus in a DETERMINISTIC structure shared
character-for-character by both engines (chrome around documents.text,
URL spellings derived from doc_id), so the oracle replays the exact
operator semantics, not a lookalike.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
from spdb_spark.session import load_tables

_CHROME_PRE = (
    '<html><body><nav><a href="/">Home</a> <a href="/about">About</a>'
    ' <a href="/contact">Contact</a></nav><p>'
)
_CHROME_POST = (
    '</p><footer><a href="/p">Privacy</a> - <a href="/t">Terms</a>'
    "</footer></body></html>"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["documents"]


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
    from spdb_spark.suite_llm import q_text_unigram_logprob

    scores = q_text_unigram_logprob(spark, sf_dir)
    return quantile_buckets(scores, "mean_logprob").select(
        "doc_id", "mean_logprob", "bucket"
    )


def _sql_ccnet_buckets() -> str:
    from spdb_spark.suite_llm import SQL_TEXT_UNIGRAM_LOGPROB

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


STAGED: dict = {
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

STAGED["llm_c4_rules"] = (q_c4_rules, SQL_C4_RULES)


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

STAGED["llm_registered_domain"] = (q_registered_domain, SQL_REGISTERED_DOMAIN)
