"""Round-9 gate queries: the crawl-composition entry points.

`llm_crawl_corpus` gates `sources/crawl.crawl_to_corpus` — the curation
tier's flagship composition (WARC responses -> main-content extraction
+ URL normalization -> Gopher quality -> exact dedup -> MinHash
near-dedup) — end-to-end against ONE DuckDB oracle composed from the
already-gated stage twins (functions/url.url_normalize_sql,
functions/html.main_text_sql, functions/quality.gopher_filter_sql, the
suite_llm minhash fragments). The fixture builds synthetic WARC records
from `documents` with KNOWN collapse structure so every stage is
discriminative:

- every doc: one response under a tracking-param URL spelling;
- doc_id%4==0: the SAME payload under a case/port/fragment respelling —
  collapses via URL normalization inside the content-addressed doc_id;
- doc_id%5==0: the same payload at a different URL — exact-text dedup
  keeps the min doc_id;
- doc_id%7==0: a near-duplicate copy (short appended sentence) whose
  3-shingle jaccard STRADDLES the 0.8 threshold across the corpus's
  length distribution — some copies drop, some survive;
- doc_id%7==3: a longer-divergence copy that stays below threshold;
- doc_id%3==0: a non-response (request) record the type filter drops;
- quality discriminates on word count: the prose chrome contributes the
  Gopher stopword floor, so pages pass iff the doc is long enough.

`llm_zipshard_ingest` gates the zip-shard source round-trip
(sources/zipshard.zip_encode -> zip_members) with a full value oracle:
member key/ext/bytes/md5 are pure functions of `documents`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spdb_spark.functions.hashing import md5_long_sql
from spdb_spark.functions.html import main_text_sql
from spdb_spark.functions.quality import gopher_filter_sql
from spdb_spark.functions.url import url_normalize_sql
from spdb_spark.session import load_tables
from spdb_spark.suite_llm import _bands_sql, _minhash_pivot_sql
from spdb_spark.suite_staging import _CHROME_POST, _CHROME_PRE, _sql_quote

_HDR = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
# Stopword-bearing prose chrome, with a PER-DOC salt token ({S} ->
# 'd<doc_id>') woven in every two words. The salt serves two purposes:
# the plain words contribute the Gopher stop-hit floor (to/the/of/have/
# with) and a word-count gap the quality stage discriminates on, while
# the weaving guarantees no 3-shingle of the chrome is shared between
# UNRELATED documents — constant chrome would make every doc pair an
# LSH candidate (measured: ~1M candidate verifications at sf0.1, 67 s;
# the exact cross-doc-boilerplate blowup main-content extraction exists
# to prevent). A doc's own records share its salt, so base-vs-copy
# similarity is unaffected.
_PROSE_PRE = "we agreed {S} to publish {S} the summary {S} of this {S} page today {S} "
_PROSE_POST = " crawlers {S} have indexed {S} it with {S} the care {S} of a {S} librarian"
_SUF_SHORT = " the mirror {S} copy adds {S} this one {S} small sentence {S} here"
_SUF_LONG = (
    " this divergent {S} copy appends {S} a much {S} longer run {S} of"
    " extra {S} prose so {S} the shingle {S} overlap with {S} the"
    " original {S} page falls {S} well below {S} the verify {S}"
    " threshold and {S} the document {S} survives independently"
)
_NEARDUP_THRESHOLD = 0.8


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_tables(spark, sf_dir)["documents"]


# Per-doc outbound-link nav block (round 12): closed-form cross-site
# targets exercising all three href quoting styles, protocol-relative
# and subdomain (eTLD+1-collapsing) spellings, a root-relative self
# link, and a mailto (excluded by scheme filter). The multipliers are
# decorrelated mod 23 (3i+1, 5i+7, 7i+3) so the self-edge coincidences
# land on different doc classes. Anchor texts are single digits: the
# block is 5 words of 9 chars with 9 link chars — dropped by the main-
# text link-density rule, so adding the block leaves extracted TEXT
# (and therefore every dedup/quality decision) untouched.
_NAV_PRE = '<div><a href="http://site'
_NAV_1 = ".example/p\">0</a> <a href='//site"
_NAV_2 = ".example/q'>1</a> <a href=https://w"
_NAV_3 = ".site"
_NAV_4 = (
    '.example/r#f>2</a> <a href="/self">3</a>'
    ' <a href="mailto:x@example.org">4</a></div>'
)


def _nav_col(d: F.Column) -> F.Column:
    return F.concat(
        F.lit(_NAV_PRE), ((d * 3 + 1) % 23).cast("string"),
        F.lit(_NAV_1), ((d * 5 + 7) % 23).cast("string"),
        F.lit(_NAV_2), (d % 3).cast("string"),
        F.lit(_NAV_3), ((d * 7 + 3) % 23).cast("string"),
        F.lit(_NAV_4),
    )


def _nav_sql() -> str:
    return (
        f"{_sql_quote(_NAV_PRE)} || ((3*doc_id+1)%23)::VARCHAR"
        f" || {_sql_quote(_NAV_1)} || ((5*doc_id+7)%23)::VARCHAR"
        f" || {_sql_quote(_NAV_2)} || (doc_id%3)::VARCHAR"
        f" || {_sql_quote(_NAV_3)} || ((7*doc_id+3)%23)::VARCHAR"
        f" || {_sql_quote(_NAV_4)}"
    )


def _crawl_warc_fixture(
    spark: SparkSession, sf_dir: str, links: bool = False
) -> DataFrame:
    """Synthetic WARC record rows (warc_type, target_uri, payload) built
    from documents — the structure the module docstring describes."""
    return warc_records_from_docs(_docs(spark, sf_dir), links=links)


def warc_records_from_docs(docs: DataFrame, links: bool = False) -> DataFrame:
    """The fixture generator over an arbitrary (doc_id, text) frame —
    shared by the gate (fixture = the documents table) and the scale
    stress (tools/stress_crawl.py: replicated corpus). links=True
    appends the per-doc outbound nav block (the ranked-crawl fixture;
    extracted text is unchanged by construction, see _NAV_PRE)."""
    d = F.col("doc_id")
    k = (d % 23).cast("string")
    n = d.cast("string")
    base_uri = F.concat(
        F.lit("http://site"), k, F.lit(".example/d"), n, F.lit("?utm_source=feed")
    )
    alt_uri = F.concat(
        F.lit("HTTP://SITE"), k, F.lit(".EXAMPLE:80/d"), n, F.lit("#top")
    )
    mirror_uri = F.concat(F.lit("http://mirror.example/d"), n)
    copy_uri = F.concat(F.lit("http://copy.example/d"), n)

    salt = F.concat(F.lit("d"), n)

    def woven(template: str) -> F.Column:
        return F.replace(F.lit(template), F.lit("{S}"), salt)

    def pay(suffix: str) -> F.Column:
        parts = [F.lit(_HDR + _CHROME_PRE), woven(_PROSE_PRE), F.col("text")]
        if suffix:
            parts.append(woven(suffix))
        parts.append(woven(_PROSE_POST))
        if links:
            parts.append(_nav_col(d))
        parts.append(F.lit(_CHROME_POST))
        return F.concat(*parts)

    rec = lambda t, uri, p: F.struct(  # noqa: E731
        F.lit(t).alias("warc_type"), uri.alias("target_uri"), p.alias("ptext")
    )
    recs = F.array_compact(
        F.array(
            rec("response", base_uri, pay("")),
            F.when(d % 4 == 0, rec("response", alt_uri, pay(""))),
            F.when(d % 5 == 0, rec("response", mirror_uri, pay(""))),
            F.when(d % 7 == 0, rec("response", copy_uri, pay(_SUF_SHORT))),
            F.when(d % 7 == 3, rec("response", copy_uri, pay(_SUF_LONG))),
            F.when(d % 3 == 0, rec("request", base_uri, pay(""))),
        )
    )
    return (
        docs.select(F.explode(recs).alias("r"))
        .select(
            F.col("r.warc_type").alias("warc_type"),
            F.col("r.target_uri").alias("target_uri"),
            F.encode(F.col("r.ptext"), "UTF-8").alias("payload"),
        )
    )


def q_crawl_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl_to_corpus composition (sources/crawl.py) over the
    synthetic WARC fixture. lang is excluded from the gate columns (the
    language heuristic is gated separately by llm_text_normalize). The
    corpus-size hint (parquet footer count x the fixture's <=3 response
    records per doc) routes the minhash verify stage to the broadcast
    form at gate scale — output identical to the shuffle form by
    construction (policy-tested in the dedup suite)."""
    from spdb_spark.sources.crawl import crawl_to_corpus
    from spdb_spark.suite_llm import _docs_rowcount

    warc = _crawl_warc_fixture(spark, sf_dir)
    out = crawl_to_corpus(
        warc,
        minhash_threshold=_NEARDUP_THRESHOLD,
        n_docs=3 * _docs_rowcount(sf_dir),
    )
    return out.select("doc_id", "text", "source", "n_chars")


def _sql_crawl_corpus(links: bool = False, ranked: bool = False) -> str:
    """The composed crawl oracle. links=True adds the per-doc nav block
    to every payload (matching warc_records_from_docs(links=True));
    ranked=True swaps the final select for the rank-prior join: the
    href host graph of the distinct fetched pages -> unrolled integer
    PageRank -> each surviving doc's registered-domain rank."""
    def woven(template: str) -> str:
        return f"replace({_sql_quote(template)}, '{{S}}', 'd' || doc_id)"

    hdr_pre = f"{_sql_quote(_HDR + _CHROME_PRE)} || {woven(_PROSE_PRE)}"
    nav = f" || {_nav_sql()}" if links else ""
    tail = f"{woven(_PROSE_POST)}{nav} || {_sql_quote(_CHROME_POST)}"
    tail_s = f"{woven(_SUF_SHORT)} || {tail}"
    tail_l = f"{woven(_SUF_LONG)} || {tail}"
    boundary = "chr(13)||chr(10)||chr(13)||chr(10)"

    def body_of(col: str) -> str:
        return (
            "(CASE WHEN strpos({c}, {b}) > 0"
            " THEN substr({c}, strpos({c}, {b}) + 4) ELSE {c} END)"
        ).format(b=boundary, c=col)

    body = body_of("pay")
    if ranked:
        from spdb_spark.functions.domains import registered_domain_sql
        from spdb_spark.functions.graph import pagerank_sql
        from spdb_spark.functions.linkgraph import host_graph_edges_sql
        from spdb_spark.functions.url import url_host_sql

        final = f""",
pages AS MATERIALIZED (
  SELECT page_url, {body_of("pay0")} AS html
  FROM (SELECT DISTINCT src AS page_url, pay AS pay0 FROM norm)
),
edges AS MATERIALIZED (
  SELECT * FROM {host_graph_edges_sql("pages")}
),
e2 AS (SELECT src_domain AS src, dst_domain AS dst, weight AS w FROM edges),
pr AS MATERIALIZED (SELECT * FROM {pagerank_sql("e2", _RANK_ITERS)}),
surv AS (
  SELECT d2.doc_id, d2.src AS source FROM d2
  WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d2.doc_id)
),
dh AS (SELECT DISTINCT {url_host_sql("source")} AS host FROM surv),
dm AS (SELECT host, coalesce(domain, host) AS dom
       FROM {registered_domain_sql("dh")})
SELECT s.doc_id, s.source,
       COALESCE(pr.rank_q, 0) AS host_rank_q
FROM surv s
JOIN dm ON {url_host_sql("s.source")} = dm.host
LEFT JOIN pr ON dm.dom = pr.node
"""
    else:
        final = """
SELECT d2.doc_id, d2.text, d2.src AS source, length(d2.text)::INT AS n_chars
FROM d2
WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d2.doc_id)
"""
    return f"""
WITH p AS (
  SELECT doc_id,
         'http://site' || (doc_id % 23) || '.example/d' || doc_id
           || '?utm_source=feed' AS base_uri,
         'HTTP://SITE' || (doc_id % 23) || '.EXAMPLE:80/d' || doc_id
           || '#top' AS alt_uri,
         'http://mirror.example/d' || doc_id AS mirror_uri,
         'http://copy.example/d' || doc_id AS copy_uri,
         {hdr_pre} || text || {tail} AS pay,
         {hdr_pre} || text || {tail_s} AS pay_s,
         {hdr_pre} || text || {tail_l} AS pay_l
  FROM documents
),
recs AS (
  SELECT base_uri AS uri, pay FROM p
  UNION ALL SELECT alt_uri, pay FROM p WHERE doc_id % 4 = 0
  UNION ALL SELECT mirror_uri, pay FROM p WHERE doc_id % 5 = 0
  UNION ALL SELECT copy_uri, pay_s FROM p WHERE doc_id % 7 = 0
  UNION ALL SELECT copy_uri, pay_l FROM p WHERE doc_id % 7 = 3
  -- the doc_id%3 'request' records never enter: type-filtered
),
norm AS (SELECT {url_normalize_sql('uri')} AS src, pay FROM recs),
-- MATERIALIZED: DuckDB inlines CTEs by default, and the minhash tail
-- below references this chain many times (8 band branches x 2 join
-- sides) — without materialization the extraction+quality stages
-- re-evaluate exponentially.
d0 AS MATERIALIZED (
  SELECT DISTINCT
         {md5_long_sql("src || chr(31) || md5(pay)")} AS doc_id,
         {main_text_sql(body)} AS text,
         src
  FROM norm
),
d1 AS (SELECT * FROM d0 WHERE length(text) > 0),
g AS MATERIALIZED (SELECT * FROM d1 WHERE {gopher_filter_sql('text')}),
keep AS (SELECT MIN(doc_id) AS doc_id FROM g GROUP BY md5(text)),
d2 AS MATERIALIZED (SELECT g.* FROM g JOIN keep USING (doc_id)),
sh AS MATERIALIZED (
  SELECT DISTINCT doc_id AS doc, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(
             range(1, greatest(len(t) - 1, 1)),
             i -> concat_ws(' ', t[i], t[i+1], t[i+2])
           )) AS shingle
    FROM (SELECT doc_id,
                 regexp_split_to_array(lower(trim(text)), '\\s+') AS t
          FROM d2)
  )
),
sigs AS MATERIALIZED ({_minhash_pivot_sql()}),
banded AS MATERIALIZED ({_bands_sql()}),
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
),
losers AS (
  SELECT DISTINCT i.doc_b AS doc_id
  FROM inter i
  JOIN sizes sa ON sa.doc = i.doc_a
  JOIN sizes sb ON sb.doc = i.doc_b
  WHERE CAST(i.inter AS DOUBLE) / (sa.sz + sb.sz - i.inter)
        >= {_NEARDUP_THRESHOLD}
){final}"""


SQL_CRAWL_CORPUS = _sql_crawl_corpus()


_ZIP_SHARDS = 16


def q_zipshard_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zip-shard source round-trip: documents grouped into synthetic
    shards (one zip built per group by an Arrow kernel via zip_encode),
    then parsed back through the REAL member scanner (zip_members).
    Member key/ext/bytes/md5 are pure functions of the corpus, so the
    oracle replays them without touching zip at all — the gate proves
    encode+parse is lossless, distributed, and deterministic."""
    import pandas as pd

    from spdb_spark.sources.zipshard import zip_members

    docs = _docs(spark, sf_dir).withColumn(
        "shard_id", (F.col("doc_id") % _ZIP_SHARDS).cast("int")
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        from spdb_spark.sources.zipshard import zip_encode

        sid = int(pdf["shard_id"].iloc[0])
        samples = {
            f"{int(r.doc_id):012d}": {"txt": str(r.text).encode("utf-8")}
            for r in pdf.itertuples(index=False)
        }
        return pd.DataFrame(
            [(f"mem://shard-{sid:04d}.zip", zip_encode(samples))],
            columns=["path", "content"],
        )

    raw = docs.groupBy("shard_id").applyInPandas(
        build, "path string, content binary"
    )
    members = zip_members(raw)
    return members.select(
        F.col("key"),
        F.col("ext"),
        F.col("n_bytes"),
        F.md5(F.col("payload")).alias("payload_md5"),
        F.col("shard"),
    )


SQL_ZIPSHARD_INGEST = f"""
SELECT lpad(doc_id::VARCHAR, 12, '0') AS key,
       'txt' AS ext,
       strlen(text)::BIGINT AS n_bytes,
       md5(text) AS payload_md5,
       'mem://shard-' || lpad((doc_id % {_ZIP_SHARDS})::VARCHAR, 4, '0')
         || '.zip' AS shard
FROM documents
"""


# ---------------------------------------------------------------------------
# Registered-domain extraction through the FULL public-suffix-list
# loader (functions/domains.py parse_public_suffix_list over the pinned
# PSL_SNAPSHOT excerpt): the fixture hosts hit the loader-only rule
# classes — a PRIVATE-section registry suffix (github.io), a real-TLD
# wildcard (*.kawasaki.jp) and its exception (!city.kawasaki.jp), a
# Unicode IDN rule, and a multi-label exact rule (com.ac).
# ---------------------------------------------------------------------------


def _psl_loader_host_col() -> "F.Column":
    k = (F.col("doc_id") % 13).cast("string")
    m = F.col("doc_id") % 6
    return (
        F.when(m == 0, F.concat(F.lit("a.site"), k, F.lit(".github.io")))
        .when(m == 1, F.concat(F.lit("x.net"), k, F.lit(".kawasaki.jp")))
        .when(m == 2, F.lit("sub.city.kawasaki.jp"))
        .when(m == 3, F.concat(F.lit("site"), k, F.lit(".中国")))
        .when(m == 4, F.concat(F.lit("www.site"), k, F.lit(".co.uk")))
        .otherwise(F.concat(F.lit("cdn.site"), k, F.lit(".com.ac")))
    )


def q_registered_domain_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spdb_spark.functions.domains import (
        PSL_SNAPSHOT,
        host_registered_domains,
        load_suffix_rules,
    )

    rules = load_suffix_rules(spark, PSL_SNAPSHOT)
    d = _docs(spark, sf_dir).select(
        "doc_id", _psl_loader_host_col().alias("host")
    )
    mapping = host_registered_domains(
        d.select("host").distinct(), rules=rules
    )
    return d.join(F.broadcast(mapping), "host").select(
        "doc_id", "host", "public_suffix", "domain"
    )


def _sql_registered_domain_psl() -> str:
    from spdb_spark.functions.domains import (
        PSL_SNAPSHOT,
        parse_public_suffix_list,
        registered_domain_sql,
    )

    host = (
        "CASE doc_id % 6 "
        "WHEN 0 THEN 'a.site' || (doc_id % 13)::VARCHAR || '.github.io' "
        "WHEN 1 THEN 'x.net' || (doc_id % 13)::VARCHAR || '.kawasaki.jp' "
        "WHEN 2 THEN 'sub.city.kawasaki.jp' "
        "WHEN 3 THEN 'site' || (doc_id % 13)::VARCHAR || '.中国' "
        "WHEN 4 THEN 'www.site' || (doc_id % 13)::VARCHAR || '.co.uk' "
        "ELSE 'cdn.site' || (doc_id % 13)::VARCHAR || '.com.ac' END"
    )
    rd = registered_domain_sql(
        "(SELECT DISTINCT host FROM d)",
        rules=parse_public_suffix_list(PSL_SNAPSHOT),
    )
    return f"""
WITH d AS (SELECT doc_id, {host} AS host FROM documents),
rd AS (SELECT * FROM {rd})
SELECT d.doc_id, d.host, rd.public_suffix, rd.domain
FROM d JOIN rd USING (host)
"""


SQL_REGISTERED_DOMAIN_PSL = _sql_registered_domain_psl()


# ---------------------------------------------------------------------------
# WARC media extraction (sources/warc.warc_media) driven end-to-end:
# synthetic crawl responses carrying REAL image payloads (PNG / GIF /
# lossless WebP, dims derived from doc_id) under a LYING Content-Type
# header — the kernel must sniff magic bytes and emit probe metadata.
# The media_id is content-addressed (md5 over encoder bytes) so the
# gate compares the metadata columns, which have closed forms.
# ---------------------------------------------------------------------------


def q_warc_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from spdb_spark.sources.warc import WARC_SCHEMA, warc_media

    docs = _docs(spark, sf_dir).select("doc_id")

    def kernel(batches):
        import numpy as np

        from spdb_spark.functions.gif import gif_encode
        from spdb_spark.functions.webp import vp8l_encode
        from spdb_spark.operators.render import png_encode

        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                img = np.full(
                    (8 + did % 5, 8 + did % 7), did % 256, np.uint8
                )
                sel = did % 3
                blob = (
                    png_encode(img)
                    if sel == 0
                    else gif_encode(img)
                    if sel == 1
                    else vp8l_encode(img, lz77_runs=True)
                )
                payload = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
                    + blob
                )
                out.append(
                    (
                        "mem://fixture",
                        did,
                        "response",
                        None,
                        f"http://img.example/d{did}",
                        None,
                        "text/plain",
                        payload,
                        len(payload),
                    )
                )
            yield pd.DataFrame(out, columns=cols)

    warc = docs.mapInPandas(kernel, WARC_SCHEMA)
    media = warc_media(warc)
    return media.select(
        "source", "container", "codec", "width", "height", "n_frames"
    )


SQL_WARC_MEDIA_PROBE = """
SELECT 'http://img.example/d' || doc_id AS source,
       CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
            ELSE 'webp' END AS container,
       CASE doc_id % 3 WHEN 0 THEN 'png/gray8' WHEN 1 THEN 'gif'
            ELSE 'webp/lossless' END AS codec,
       (8 + doc_id % 7)::INT AS width,
       (8 + doc_id % 5)::INT AS height,
       CAST(1 AS BIGINT) AS n_frames
FROM documents
"""


# ---------------------------------------------------------------------------
# Domain blocklist filtering at eTLD+1 (functions/domains.py
# domain_blocklist_filter): blocking a registered domain must remove its
# subdomain spellings (a.site3.github.io) while sibling domains survive.
# ---------------------------------------------------------------------------

_BLOCKLIST = ("site3.github.io", "city.kawasaki.jp", "site5.co.uk")


def q_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spdb_spark.functions.domains import (
        PSL_SNAPSHOT,
        domain_blocklist_filter,
        load_suffix_rules,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", _psl_loader_host_col().alias("host")
    )
    return domain_blocklist_filter(
        d,
        _BLOCKLIST,
        rules=load_suffix_rules(spark, PSL_SNAPSHOT),
        keep_domain=True,
    ).select("doc_id", "host", "domain")


def _sql_domain_blocklist() -> str:
    from spdb_spark.functions.domains import (
        PSL_SNAPSHOT,
        parse_public_suffix_list,
        registered_domain_sql,
    )

    host = (
        "CASE doc_id % 6 "
        "WHEN 0 THEN 'a.site' || (doc_id % 13)::VARCHAR || '.github.io' "
        "WHEN 1 THEN 'x.net' || (doc_id % 13)::VARCHAR || '.kawasaki.jp' "
        "WHEN 2 THEN 'sub.city.kawasaki.jp' "
        "WHEN 3 THEN 'site' || (doc_id % 13)::VARCHAR || '.中国' "
        "WHEN 4 THEN 'www.site' || (doc_id % 13)::VARCHAR || '.co.uk' "
        "ELSE 'cdn.site' || (doc_id % 13)::VARCHAR || '.com.ac' END"
    )
    rd = registered_domain_sql(
        "(SELECT DISTINCT host FROM d)",
        rules=parse_public_suffix_list(PSL_SNAPSHOT),
    )
    blocked = ", ".join(f"'{b}'" for b in _BLOCKLIST)
    return f"""
WITH d AS (SELECT doc_id, {host} AS host FROM documents),
rd AS (SELECT * FROM {rd})
SELECT d.doc_id, d.host, rd.domain
FROM d JOIN rd USING (host)
WHERE rd.domain IS NULL OR rd.domain NOT IN ({blocked})
"""


SQL_DOMAIN_BLOCKLIST = _sql_domain_blocklist()


# ---------------------------------------------------------------------------
# fastText-style quality classifier (functions/classifier.py): one-pass
# NB log-odds training on deterministic labels (doc_id % 10 < 3 plays
# the "reference-like" class), mean-pooled linear inference. The oracle
# replays hashed features, Laplace log-odds, and the per-doc mean.
# ---------------------------------------------------------------------------

_CLF_BUCKETS = 512


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spdb_spark.functions.classifier import (
        linear_text_classifier,
        nb_classifier_weights,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    pos = docs.where(F.col("doc_id") % 10 < 3)
    neg = docs.where(F.col("doc_id") % 10 >= 3)
    w = nb_classifier_weights(pos, neg, n_buckets=_CLF_BUCKETS)
    out = linear_text_classifier(docs, w, n_buckets=_CLF_BUCKETS)
    return out.select(
        "doc_id",
        "n_grams",
        (F.floor(F.col("score") * 1000000) / 1000000).alias("score"),
    )


def _sql_quality_classifier() -> str:
    from spdb_spark.functions.hashing import md5_long_sql

    toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    nb = _CLF_BUCKETS
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
b AS (SELECT doc_id, ({md5_long_sql('gram')} % {nb}) AS bucket FROM g),
cneg AS (SELECT bucket, COUNT(*) AS c_n FROM b WHERE doc_id % 10 >= 3
         GROUP BY bucket),
cpos AS (SELECT bucket, COUNT(*) AS c_p FROM b WHERE doc_id % 10 < 3
         GROUP BY bucket),
tot AS (SELECT (SELECT COUNT(*) FROM b WHERE doc_id % 10 >= 3) AS t_n,
               (SELECT COUNT(*) FROM b WHERE doc_id % 10 < 3) AS t_p),
w AS (
  SELECT COALESCE(cneg.bucket, cpos.bucket) AS bucket,
         ln((COALESCE(c_p, 0) + 1.0) / (t_p + {nb}.0))
         - ln((COALESCE(c_n, 0) + 1.0) / (t_n + {nb}.0)) AS weight
  FROM cneg FULL OUTER JOIN cpos ON cneg.bucket = cpos.bucket
  CROSS JOIN tot
)
SELECT b.doc_id,
       COUNT(*)::BIGINT AS n_grams,
       FLOOR((SUM(COALESCE(w.weight, 0)) / COUNT(*)) * 1000000) / 1000000
         AS score
FROM b LEFT JOIN w USING (bucket) GROUP BY b.doc_id
"""


SQL_QUALITY_CLASSIFIER = _sql_quality_classifier()


# ---------------------------------------------------------------------------
# Duplicate-span removal (functions/spandedup.py, Lee-et-al-style exact
# substring dedup): docs with doc_id%3==0 carry a shared 18-token tail
# that must be cut from every carrier while the unique bodies survive;
# stride=1 gives full exact-substring sensitivity at gate scale.
# ---------------------------------------------------------------------------

_SPAN_W = 12
_SPAN_SHARED = (
    "this exact licensing boilerplate sentence repeats verbatim across"
    " many crawled pages and must be removed by span deduplication"
)


def q_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spdb_spark.functions.spandedup import remove_duplicate_spans

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" " + _SPAN_SHARED)),
        ).otherwise(F.col("text")).alias("text"),
    )
    return remove_duplicate_spans(d, window=_SPAN_W, stride=1)


def _sql_dup_span_removal() -> str:
    from spdb_spark.functions.hashing import md5_long_sql

    w = _SPAN_W
    shared = _sql_quote(" " + _SPAN_SHARED)
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || {shared} ELSE text END AS text
  FROM documents
),
t AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM d
),
w AS MATERIALIZED (
  SELECT doc_id, i - 1 AS start,
         {md5_long_sql(f"array_to_string(t[i:i+{w - 1}], ' ')")} AS h
  FROM t, unnest(range(1, len(t) - {w} + 2)) AS u(i)
  WHERE len(t) >= {w}
),
dh AS (SELECT h FROM w GROUP BY h HAVING COUNT(*) >= 2),
dw AS MATERIALIZED (SELECT w.* FROM w JOIN dh USING (h)),
tok AS MATERIALIZED (
  SELECT doc_id, i - 1 AS idx, t[i] AS tok
  FROM t, unnest(range(1, len(t) + 1)) AS u(i)
),
kept AS (
  SELECT k.doc_id, k.idx, k.tok FROM tok k
  WHERE NOT EXISTS (
    SELECT 1 FROM dw
    WHERE dw.doc_id = k.doc_id
      AND k.idx >= dw.start AND k.idx < dw.start + {w}
  )
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(agg.clean_text, '') AS clean_text,
       len(t.t)::BIGINT AS n_tokens,
       (len(t.t) - COALESCE(agg.n_kept, 0))::BIGINT AS n_removed
FROM t LEFT JOIN agg USING (doc_id)
"""


SQL_DUP_SPAN_REMOVAL = _sql_dup_span_removal()


def q_dup_span_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lee-et-al keep-one-copy repair: same fixture as
    llm_dup_span_removal, but the canonical first occurrence
    (min (doc_id, start) per duplicated hash) of the shared span
    survives — here the smallest doc_id divisible by 3 keeps its copy."""
    from spdb_spark.functions.spandedup import remove_duplicate_spans

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" " + _SPAN_SHARED)),
        ).otherwise(F.col("text")).alias("text"),
    )
    return remove_duplicate_spans(d, window=_SPAN_W, stride=1, keep="first")


def _sql_dup_span_keep_first() -> str:
    from spdb_spark.functions.hashing import md5_long_sql

    w = _SPAN_W
    shared = _sql_quote(" " + _SPAN_SHARED)
    return f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || {shared} ELSE text END AS text
  FROM documents
),
t AS MATERIALIZED (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM d
),
w AS MATERIALIZED (
  SELECT doc_id, i - 1 AS start,
         {md5_long_sql(f"array_to_string(t[i:i+{w - 1}], ' ')")} AS h
  FROM t, unnest(range(1, len(t) - {w} + 2)) AS u(i)
  WHERE len(t) >= {w}
),
dh AS (SELECT h FROM w GROUP BY h HAVING COUNT(*) >= 2),
dw0 AS MATERIALIZED (SELECT w.* FROM w JOIN dh USING (h)),
firsts AS (
  SELECT h, doc_id, start FROM (
    SELECT dw0.*,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, start) AS rn
    FROM dw0
  ) WHERE rn = 1
),
dw AS MATERIALIZED (
  SELECT dw0.* FROM dw0
  WHERE NOT EXISTS (
    SELECT 1 FROM firsts f
    WHERE f.h = dw0.h AND f.doc_id = dw0.doc_id AND f.start = dw0.start
  )
),
tok AS MATERIALIZED (
  SELECT doc_id, i - 1 AS idx, t[i] AS tok
  FROM t, unnest(range(1, len(t) + 1)) AS u(i)
),
kept AS (
  SELECT k.doc_id, k.idx, k.tok FROM tok k
  WHERE NOT EXISTS (
    SELECT 1 FROM dw
    WHERE dw.doc_id = k.doc_id
      AND k.idx >= dw.start AND k.idx < dw.start + {w}
  )
),
agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY idx) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(agg.clean_text, '') AS clean_text,
       len(t.t)::BIGINT AS n_tokens,
       (len(t.t) - COALESCE(agg.n_kept, 0))::BIGINT AS n_removed
FROM t LEFT JOIN agg USING (doc_id)
"""


SQL_DUP_SPAN_KEEP_FIRST = _sql_dup_span_keep_first()


def q_crawl_corpus_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING crawl composition (streaming/crawl.StreamingCrawlCorpus)
    driven end-to-end against the SAME oracle as llm_crawl_corpus: the
    fixture's WARC records are encoded into three .warc.gz files (split
    deterministically by URI hash so content groups straddle files in
    both arrival orders), ingested one file per micro-batch through the
    foreachBatch sink, and `corpus()` must equal the batch pipeline's
    output — the read-time canonicalization replays the batch dedup
    policies exactly, so the one SQL oracle gates both engines' paths.

    The result is collected and re-created as a local DataFrame because
    the sink state lives in a temp dir removed before return (bounded:
    the curated corpus at gate SF)."""
    import hashlib
    import shutil
    import tempfile

    from spdb_spark.sources.warc import warc_encode
    from spdb_spark.streaming.crawl import (
        StreamingCrawlCorpus,
        stream_crawl_docs,
    )

    recs = _crawl_warc_fixture(spark, sf_dir).collect()
    recs = sorted(
        recs, key=lambda r: hashlib.md5(r.target_uri.encode()).hexdigest()
    )
    files: list[list[dict]] = [[], [], []]
    for i, r in enumerate(recs):
        files[i % 3].append(
            {
                "warc_type": r.warc_type,
                "target_uri": r.target_uri,
                "payload": bytes(r.payload),
            }
        )
    tmp = tempfile.mkdtemp(prefix="crawlstream-")
    try:
        import os

        feed = os.path.join(tmp, "feed")
        os.makedirs(feed)
        for j, fl in enumerate(files):
            with open(os.path.join(feed, f"f{j}.warc.gz"), "wb") as f:
                f.write(warc_encode(fl))
        sink = StreamingCrawlCorpus(
            spark,
            os.path.join(tmp, "state"),
            minhash_threshold=_NEARDUP_THRESHOLD,
        )
        q = sink.start(
            stream_crawl_docs(spark, feed, max_files_per_trigger=1),
            os.path.join(tmp, "ckpt"),
        )
        try:
            # availableNow terminates on its own; a False return means a
            # hung stream — fail loudly rather than reading partial sink
            # state (which would surface as a confusing row mismatch)
            if not q.awaitTermination(600):
                raise TimeoutError(
                    "crawl stream did not finish within 600s"
                )
        finally:
            q.stop()  # no-op if terminated; never rmtree under a live query
        rows = (
            sink.corpus().select("doc_id", "text", "source", "n_chars").collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, n_chars int"
    )


# ---------------------------------------------------------------------------
# Round 12: the REAL outbound-link host graph. llm_host_graph_edges
# gates the extraction machinery itself (href targets -> resolve ->
# host -> eTLD+1 -> weighted edges) on closed-form synthetic pages;
# llm_crawl_corpus_ranked gates the full composition: the same WARC
# fixture as llm_crawl_corpus (plus nav blocks that leave extracted
# text untouched), curated end-to-end, with each surviving doc joined
# to the PageRank of its registered domain computed from the crawl's
# OWN link graph — the Common Crawl quality-prior recipe.
# ---------------------------------------------------------------------------

_RANK_ITERS = 5


def _link_pages(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    page_url = F.concat(
        F.lit("http://site"), (d % 23).cast("string"),
        F.lit(".example/dir/d"), d.cast("string"), F.lit(".html"),
    )
    html = F.concat(
        F.lit("<html><body><p>doc intro</p>"),
        _nav_col(d),
        F.lit("</body></html>"),
    )
    return docs.select(page_url.alias("page_url"), html.alias("html"))


def q_host_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted eTLD+1 link-graph edges (functions/linkgraph.py) from
    synthetic pages with closed-form cross-site links: every href
    quoting style, protocol-relative + root-relative + subdomain
    resolution, scheme filtering, self-edge dropping, and the
    registered-domain collapse are all discriminative in the output
    weights."""
    from spdb_spark.functions.linkgraph import host_graph_edges

    pages = _link_pages(_docs(spark, sf_dir))
    return host_graph_edges(pages, "page_url", "html")


def _sql_host_graph_edges() -> str:
    from spdb_spark.functions.linkgraph import host_graph_edges_sql

    return f"""
WITH pages AS (
  SELECT 'http://site' || (doc_id % 23)::VARCHAR || '.example/dir/d'
           || doc_id::VARCHAR || '.html' AS page_url,
         '<html><body><p>doc intro</p>' || {_nav_sql()}
           || '</body></html>' AS html
  FROM documents
)
SELECT * FROM {host_graph_edges_sql("pages")}
"""


SQL_HOST_GRAPH_EDGES = _sql_host_graph_edges()


def q_crawl_corpus_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """crawl_to_corpus with rank_prior=True over the linked WARC
    fixture: the curated corpus joined to the integer-protocol PageRank
    of each doc's registered domain, the rank computed from the href
    host graph of the crawl's own distinct fetched pages."""
    from spdb_spark.sources.crawl import crawl_to_corpus
    from spdb_spark.suite_llm import _docs_rowcount

    warc = _crawl_warc_fixture(spark, sf_dir, links=True)
    out = crawl_to_corpus(
        warc,
        minhash_threshold=_NEARDUP_THRESHOLD,
        n_docs=3 * _docs_rowcount(sf_dir),
        rank_prior=True,
        rank_iterations=_RANK_ITERS,
    )
    return out.select("doc_id", "source", "host_rank_q")


SQL_CRAWL_CORPUS_RANKED = _sql_crawl_corpus(links=True, ranked=True)


def q_crawl_corpus_ranked_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING rank-prior composition driven end-to-end against
    the SAME oracle as llm_crawl_corpus_ranked: the linked WARC fixture
    split into three files (URI-hash order, so content groups straddle
    micro-batches), ingested through BOTH sinks — StreamingCrawlCorpus
    (robots-less here, matching the batch gate) for the curated docs
    and StreamingLinkGraph for the crawl's own href host graph — then
    corpus_ranked() joins the accumulated graph's PageRank at read
    time. The driver compare against the batch-composed oracle IS the
    stream == batch proof (the shared-oracle pattern of
    llm_host_pagerank_stream)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from spdb_spark.sources.warc import warc_encode
    from spdb_spark.streaming.crawl import (
        StreamingCrawlCorpus,
        StreamingLinkGraph,
        stream_crawl_docs,
        stream_warc_records,
    )

    recs = _crawl_warc_fixture(spark, sf_dir, links=True).collect()
    recs = sorted(
        recs, key=lambda r: hashlib.md5(r.target_uri.encode()).hexdigest()
    )
    files: list[list[dict]] = [[], [], []]
    for i, r in enumerate(recs):
        files[i % 3].append(
            {
                "warc_type": r.warc_type,
                "target_uri": r.target_uri,
                "payload": bytes(r.payload),
            }
        )
    tmp = tempfile.mkdtemp(prefix="crawlrankstream-")
    try:
        feed = os.path.join(tmp, "feed")
        os.makedirs(feed)
        for j, fl in enumerate(files):
            with open(os.path.join(feed, f"f{j}.warc.gz"), "wb") as f:
                f.write(warc_encode(fl))
        corpus_sink = StreamingCrawlCorpus(
            spark,
            os.path.join(tmp, "cstate"),
            minhash_threshold=_NEARDUP_THRESHOLD,
        )
        graph_sink = StreamingLinkGraph(spark, os.path.join(tmp, "gstate"))
        for sink, stream, ck in (
            (
                corpus_sink,
                stream_crawl_docs(spark, feed, max_files_per_trigger=1),
                "cckpt",
            ),
            (
                graph_sink,
                stream_warc_records(spark, feed, max_files_per_trigger=1),
                "gckpt",
            ),
        ):
            q = sink.start(stream, os.path.join(tmp, ck))
            try:
                if not q.awaitTermination(600):
                    raise TimeoutError(
                        "crawl stream did not finish within 600s"
                    )
            finally:
                q.stop()
        rows = (
            corpus_sink.corpus_ranked(graph_sink, rank_iterations=_RANK_ITERS)
            .select("doc_id", "source", "host_rank_q")
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        rows, "doc_id long, source string, host_rank_q long"
    )


STAGED_R13: dict = {
    "llm_crawl_corpus_ranked_stream": (
        q_crawl_corpus_ranked_stream,
        SQL_CRAWL_CORPUS_RANKED,
    ),
}


# Round-14 staging (entries appended at the bottom of this module).
STAGED_R14: dict = {}


STAGED_R12: dict = {
    "llm_host_graph_edges": (q_host_graph_edges, SQL_HOST_GRAPH_EDGES),
    "llm_crawl_corpus_ranked": (q_crawl_corpus_ranked, SQL_CRAWL_CORPUS_RANKED),
}


STAGED_R10: dict = {
    "llm_crawl_corpus_stream": (q_crawl_corpus_stream, SQL_CRAWL_CORPUS),
    "llm_dup_span_keep_first": (q_dup_span_keep_first, SQL_DUP_SPAN_KEEP_FIRST),
}


STAGED_R9: dict = {
    "llm_crawl_corpus": (q_crawl_corpus, SQL_CRAWL_CORPUS),
    "llm_zipshard_ingest": (q_zipshard_ingest, SQL_ZIPSHARD_INGEST),
    "llm_registered_domain_psl": (
        q_registered_domain_psl,
        SQL_REGISTERED_DOMAIN_PSL,
    ),
    "llm_warc_media_probe": (q_warc_media_probe, SQL_WARC_MEDIA_PROBE),
    "llm_domain_blocklist": (q_domain_blocklist, SQL_DOMAIN_BLOCKLIST),
    "llm_quality_classifier": (q_quality_classifier, SQL_QUALITY_CLASSIFIER),
    "llm_dup_span_removal": (q_dup_span_removal, SQL_DUP_SPAN_REMOVAL),
}


# ---------------------------------------------------------------------------
# Round 12 (second batch): robots.txt exclusion (functions/robots.py).
# 23 synthetic hosts carry closed-form robots files — agent groups
# (specific + catch-all), allow-overrides, `*` wildcards, `$` anchors,
# empty-disallow allow-all hosts, comments/blank lines — and six URL
# path classes per doc make every rule kind discriminative. The oracle
# replays parse (line split -> group window) and match (pattern ->
# regex, longest-match, allow-wins-tie) exactly.
# ---------------------------------------------------------------------------

_RB_AGENT = "trainingbot"


def _robots_fixture(spark: SparkSession, sf_dir: str):
    d = F.col("doc_id")
    k = (d % 23).cast("string")
    k3 = ((d % 23) * 3 % 7).cast("string")
    host = F.concat(F.lit("site"), k, F.lit(".example"))
    path = (
        F.when(d % 6 == 0, F.concat(F.lit("/sec"), k, F.lit("/page"), d.cast("string")))
        .when(d % 6 == 1, F.concat(F.lit("/sec"), k, F.lit("/open/x")))
        .when(d % 6 == 2, F.concat(F.lit("/d"), k, F.lit("file")))
        .when(d % 6 == 3, F.concat(F.lit("/p"), k3))
        .when(d % 6 == 4, F.concat(F.lit("/p"), k3, F.lit("x")))
        .otherwise(F.lit("/welcome"))
    )
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("http://"), host, path).alias("source"),
    )
    hk = F.col("id").cast("string")
    hk3 = (F.col("id") * 3 % 7).cast("string")

    def rules_for(agent: str) -> F.Column:
        return F.concat(
            F.lit("# synthetic\nUser-agent: "), F.lit(agent),
            F.lit("\nDisallow: /sec"), hk,
            F.lit("\nAllow: /sec"), hk, F.lit("/open"),
            F.lit("\nDisallow: /d"), hk, F.lit("*"),
            F.lit("\nDisallow: /p"), hk3, F.lit("$"),
        )

    star_tail = F.lit("\n\nUser-agent: *\nDisallow: /\n")
    rb_full = F.concat(rules_for(_RB_AGENT), star_tail)
    # longest-prefix selection: 'training' IS a prefix of the product
    # token; the longer decoy 'trainingbot-images' is NOT — the decoy's
    # blanket Disallow must be ignored and 'training''s rules obeyed
    rb_prefix = F.concat(
        rules_for("training"),
        F.lit("\n\nUser-agent: "), F.lit(_RB_AGENT),
        F.lit("-images\nDisallow: /"),
        star_tail,
    )
    # a matched group with NO rules (only a non-rule directive) allows
    # all — it must not fall through to the blocking '*' group, and its
    # crawl-delay line must still bound the groups around it
    rb_ruleless = F.concat(
        F.lit("User-agent: "), F.lit(_RB_AGENT),
        F.lit("\nCrawl-delay: 1"),
        star_tail,
    )
    robots = spark.range(23).select(
        F.concat(F.lit("site"), hk, F.lit(".example")).alias("host"),
        F.when(F.col("id") % 4 == 0, F.lit("User-agent: *\nDisallow:\n"))
        .when(F.col("id") % 4 == 1, rb_prefix)
        .when(F.col("id") % 4 == 2, rb_ruleless)
        .otherwise(rb_full)
        .alias("robots_txt"),
    )
    return docs, robots


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spdb_spark.functions.robots import robots_filter

    docs, robots = _robots_fixture(spark, sf_dir)
    return robots_filter(docs, robots, _RB_AGENT, keep_verdict=True)


def _sql_robots_filter() -> str:
    from spdb_spark.functions.robots import robots_filter_sql

    return f"""
WITH d AS (
  SELECT doc_id,
         'http://site' || (doc_id % 23)::VARCHAR || '.example' ||
         CASE doc_id % 6
           WHEN 0 THEN '/sec' || (doc_id % 23)::VARCHAR || '/page'
                       || doc_id::VARCHAR
           WHEN 1 THEN '/sec' || (doc_id % 23)::VARCHAR || '/open/x'
           WHEN 2 THEN '/d' || (doc_id % 23)::VARCHAR || 'file'
           WHEN 3 THEN '/p' || ((doc_id % 23) * 3 % 7)::VARCHAR
           WHEN 4 THEN '/p' || ((doc_id % 23) * 3 % 7)::VARCHAR || 'x'
           ELSE '/welcome' END AS source
  FROM documents
),
rb AS (
  SELECT 'site' || i::VARCHAR || '.example' AS host,
         CASE i % 4
           WHEN 0
           THEN 'User-agent: *' || chr(10) || 'Disallow:' || chr(10)
           WHEN 1
           THEN '# synthetic' || chr(10)
             || 'User-agent: training' || chr(10)
             || 'Disallow: /sec' || i::VARCHAR || chr(10)
             || 'Allow: /sec' || i::VARCHAR || '/open' || chr(10)
             || 'Disallow: /d' || i::VARCHAR || '*' || chr(10)
             || 'Disallow: /p' || (i * 3 % 7)::VARCHAR || '$' || chr(10)
             || chr(10) || 'User-agent: {_RB_AGENT}-images' || chr(10)
             || 'Disallow: /'
             || chr(10) || chr(10) || 'User-agent: *' || chr(10)
             || 'Disallow: /' || chr(10)
           WHEN 2
           THEN 'User-agent: {_RB_AGENT}' || chr(10)
             || 'Crawl-delay: 1'
             || chr(10) || chr(10) || 'User-agent: *' || chr(10)
             || 'Disallow: /' || chr(10)
           ELSE '# synthetic' || chr(10)
             || 'User-agent: {_RB_AGENT}' || chr(10)
             || 'Disallow: /sec' || i::VARCHAR || chr(10)
             || 'Allow: /sec' || i::VARCHAR || '/open' || chr(10)
             || 'Disallow: /d' || i::VARCHAR || '*' || chr(10)
             || 'Disallow: /p' || (i * 3 % 7)::VARCHAR || '$' || chr(10)
             || chr(10) || 'User-agent: *' || chr(10) || 'Disallow: /'
             || chr(10)
         END AS robots_txt
  FROM range(0, 23) t(i)
)
SELECT doc_id, source, allowed
FROM {robots_filter_sql("d", "rb", _RB_AGENT)}
"""


SQL_ROBOTS_FILTER = _sql_robots_filter()


STAGED_R12["llm_robots_filter"] = (q_robots_filter, SQL_ROBOTS_FILTER)


# ---------------------------------------------------------------------------
# Round 13 (second batch): the frontier operators that CONSUME the
# robots side-channels. llm_sitemap_urls gates sitemap-XML parsing with
# a full value oracle (every field is a closed form of documents);
# llm_frontier_schedule composes robots parse -> crawl-delay selection
# -> politeness scheduling end-to-end against the SQL twins.
# ---------------------------------------------------------------------------


def _sitemap_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """23 per-host sitemaps built from documents: one <url> block per
    doc (host = doc_id % 23), loc always present — CDATA-wrapped on the
    %11 class (verbatim, inner &amp; must NOT decode), entity-escaped
    on the %7 class (&amp;/&apos; must decode), stray spaces the parser
    must trim otherwise — lastmod/changefreq/priority present on
    deterministic doc classes."""
    d = F.col("doc_id")
    k = (d % 23).cast("string")
    n = d.cast("string")
    base = F.concat(F.lit("http://site"), k, F.lit(".example/d"), n)
    loc = F.concat(
        F.lit("\n  <url>\n    "),
        F.when(
            d % 11 == 0,
            F.concat(
                F.lit("<loc><![CDATA["), base,
                F.lit("?cd=1&raw=2&amp;lit]]></loc>"),
            ),
        )
        .when(
            d % 7 == 0,
            F.concat(
                F.lit("<loc>"), base,
                F.lit("?a=1&amp;b=&apos;2&apos;</loc>"),
            ),
        )
        .otherwise(F.concat(F.lit("<loc> "), base, F.lit(" </loc>"))),
    )
    lastmod = F.when(
        d % 3 == 0,
        F.concat(
            F.lit("\n    <lastmod>2026-01-"),
            F.lpad((d % 28 + 1).cast("string"), 2, "0"),
            F.lit("</lastmod>"),
        ),
    ).otherwise(F.lit(""))
    changefreq = F.when(
        d % 4 == 0,
        F.concat(
            F.lit("\n    <changefreq>"),
            F.element_at(
                F.array(F.lit("daily"), F.lit("weekly"), F.lit("monthly")),
                (d % 3 + 1).cast("int"),
            ),
            F.lit("</changefreq>"),
        ),
    ).otherwise(F.lit(""))
    priority = F.when(
        d % 5 != 0,
        F.concat(
            F.lit("\n    <priority>0."), (d % 10).cast("string"),
            F.lit("</priority>"),
        ),
    ).otherwise(F.lit(""))
    block = F.concat(loc, lastmod, changefreq, priority, F.lit("\n  </url>"))
    docs = _docs(spark, sf_dir).select(
        (d % 23).alias("k"), F.struct(d.alias("doc_id"), block.alias("b")).alias("s")
    )
    return docs.groupBy("k").agg(
        F.concat(
            F.lit('<?xml version="1.0"?>\n<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["b"]
                ),
                "",
            ),
            F.lit("\n</urlset>\n"),
        ).alias("xml")
    ).select(
        F.concat(F.lit("site"), F.col("k").cast("string"), F.lit(".example")).alias("host"),
        "xml",
    )


def q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap ingestion (sources/frontier.sitemap_urls) over the
    synthetic per-host sitemaps; the oracle emits the closed forms
    directly from documents, so the compare proves the XML round-trip
    is lossless (the zipshard-gate pattern)."""
    from spdb_spark.sources.frontier import sitemap_urls

    return sitemap_urls(_sitemap_fixture(spark, sf_dir))


SQL_SITEMAP_URLS = """
SELECT 'site' || (doc_id % 23)::VARCHAR || '.example' AS host,
       'http://site' || (doc_id % 23)::VARCHAR || '.example/d'
         || doc_id::VARCHAR
         || CASE WHEN doc_id % 11 = 0 THEN '?cd=1&raw=2&amp;lit'
                 WHEN doc_id % 7 = 0 THEN '?a=1&b=''2'''
                 ELSE '' END AS loc,
       CASE WHEN doc_id % 3 = 0
            THEN '2026-01-' || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0')
       END AS lastmod,
       CASE WHEN doc_id % 4 = 0
            THEN ['daily', 'weekly', 'monthly'][(doc_id % 3 + 1)::INT]
       END AS changefreq,
       CASE WHEN doc_id % 5 <> 0
            THEN TRY_CAST('0.' || (doc_id % 10)::VARCHAR AS DOUBLE)
       END AS priority
FROM documents
"""


_FS_AGENT = "trainingbot"
_FS_DEFAULT = 2.0
_FS_START = 100.0


def _frontier_fixture(spark: SparkSession, sf_dir: str):
    d = F.col("doc_id")
    k = (d % 23).cast("string")
    urls = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("http://site"), k, F.lit(".example/p"), d.cast("string")
        ).alias("source"),
    )
    i = F.col("id")
    rb = spark.range(23).select(
        F.concat(F.lit("site"), i.cast("string"), F.lit(".example")).alias(
            "host"
        ),
        F.when(
            i % 4 == 1,
            F.concat(
                F.lit("User-agent: trainingbot\nCrawl-delay: "),
                i.cast("string"),
                F.lit(".5\n\nUser-agent: *\nCrawl-delay: 9\n"),
            ),
        )
        .when(
            i % 4 == 2,
            F.concat(
                F.lit("User-agent: *\nCrawl-delay: "),
                i.cast("string"),
                F.lit("\n"),
            ),
        )
        .when(
            i % 4 == 3,
            F.lit("User-agent: trainingbot\nCrawl-delay: soon\n"),
        )
        .otherwise(F.lit("User-agent: *\nDisallow:\n"))
        .alias("robots_txt"),
    )
    return urls, rb


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots parse -> longest-prefix crawl-delay selection -> per-host
    politeness slots, end-to-end: per-host delays come in specific-
    agent, star-group, non-numeric (-> default) and absent (-> default)
    flavors, and the schedule lays each host's URLs on
    start + slot * delay."""
    from spdb_spark.functions.robots import robots_crawl_delays
    from spdb_spark.sources.frontier import frontier_schedule

    urls, rb = _frontier_fixture(spark, sf_dir)
    delays = robots_crawl_delays(rb, _FS_AGENT)
    return frontier_schedule(
        urls,
        delays,
        url_col="source",
        default_delay_s=_FS_DEFAULT,
        start_s=_FS_START,
    )


def _sql_frontier_schedule() -> str:
    from spdb_spark.functions.robots import robots_crawl_delays_sql
    from spdb_spark.sources.frontier import frontier_schedule_sql

    return f"""
WITH d AS (
  SELECT doc_id,
         'http://site' || (doc_id % 23)::VARCHAR || '.example/p'
           || doc_id::VARCHAR AS source
  FROM documents
),
rb AS (
  SELECT 'site' || i::VARCHAR || '.example' AS host,
         CASE i % 4
           WHEN 1 THEN 'User-agent: trainingbot' || chr(10)
             || 'Crawl-delay: ' || i::VARCHAR || '.5' || chr(10)
             || chr(10) || 'User-agent: *' || chr(10)
             || 'Crawl-delay: 9' || chr(10)
           WHEN 2 THEN 'User-agent: *' || chr(10)
             || 'Crawl-delay: ' || i::VARCHAR || chr(10)
           WHEN 3 THEN 'User-agent: trainingbot' || chr(10)
             || 'Crawl-delay: soon' || chr(10)
           ELSE 'User-agent: *' || chr(10) || 'Disallow:' || chr(10)
         END AS robots_txt
  FROM range(0, 23) t(i)
),
dl AS (SELECT * FROM {robots_crawl_delays_sql("rb", _FS_AGENT)})
SELECT doc_id, source, host, delay_s, slot, fetch_at_s
FROM {frontier_schedule_sql("d", "dl", "source", _FS_DEFAULT, _FS_START)}
"""


SQL_FRONTIER_SCHEDULE = _sql_frontier_schedule()


STAGED_R13["llm_sitemap_urls"] = (q_sitemap_urls, SQL_SITEMAP_URLS)
STAGED_R13["llm_frontier_schedule"] = (
    q_frontier_schedule,
    SQL_FRONTIER_SCHEDULE,
)


def q_frontier_schedule_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING frontier driven against the SAME oracle as
    llm_frontier_schedule: the candidate URLs arrive across three
    parquet files (URI-hash order, one file per micro-batch, with
    duplicate rediscoveries injected so the url-set semantics are
    discriminative), accumulate in the StreamingFrontier ledger, and
    schedule() must equal the batch frontier_schedule over the distinct
    union — the shared-oracle stream == batch pattern."""
    import hashlib
    import os
    import shutil
    import tempfile

    from spdb_spark.functions.robots import robots_crawl_delays
    from spdb_spark.streaming.frontier import StreamingFrontier

    urls, rb = _frontier_fixture(spark, sf_dir)
    delays = robots_crawl_delays(rb, _FS_AGENT)
    rows = urls.collect()
    rows = sorted(
        rows, key=lambda r: hashlib.md5(r.source.encode()).hexdigest()
    )
    files: list[list[tuple]] = [[], [], []]
    for i, r in enumerate(rows):
        files[i % 3].append((r.doc_id, r.source))
        if i % 5 == 0:  # rediscovery lands in the NEXT file
            files[(i + 1) % 3].append((r.doc_id, r.source))
    tmp = tempfile.mkdtemp(prefix="frontierstream-")
    try:
        feed = os.path.join(tmp, "feed")
        os.makedirs(feed)
        for j, fl in enumerate(files):
            spark.createDataFrame(
                fl, "doc_id long, source string"
            ).coalesce(1).write.parquet(os.path.join(feed, f"f{j}"))
        sink = StreamingFrontier(
            spark,
            os.path.join(tmp, "state"),
            "doc_id long, source string",
            url_col="source",
        )
        stream = (
            spark.readStream.schema("doc_id long, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(feed, "*"))
        )
        q = sink.start(stream, os.path.join(tmp, "ckpt"))
        try:
            if not q.awaitTermination(600):
                raise TimeoutError(
                    "frontier stream did not finish within 600s"
                )
        finally:
            q.stop()
        out = sink.schedule(
            delays, default_delay_s=_FS_DEFAULT, start_s=_FS_START
        )
        got = out.select(
            "doc_id", "source", "host", "delay_s", "slot", "fetch_at_s"
        ).collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        got,
        "doc_id long, source string, host string, delay_s double,"
        " slot long, fetch_at_s double",
    )


STAGED_R13["llm_frontier_schedule_stream"] = (
    q_frontier_schedule_stream,
    SQL_FRONTIER_SCHEDULE,
)


# ---------------------------------------------------------------------------
# Round 14: recursive sitemap-tree expansion (index -> index -> urlset,
# with an unfetched child and a cycle back to the root) and the tree ->
# politeness-schedule composition, which also driver-gates the r13
# advice fix (frontier_schedule REPLACING the incoming host column
# instead of duplicating it).
# ---------------------------------------------------------------------------


def _sitemap_tree_fixture(spark: SparkSession, sf_dir: str):
    """Per-host sitemap TREE from documents: root index -> [urlset
    a.xml (docs with even doc_id), sub-index sub.xml, missing.xml
    (never fetched)]; sub.xml -> [urlset c.xml (odd doc_id), root.xml
    again (a cycle the expansion must not re-walk)]. Returns (roots,
    fetched): the entry locs and the (loc, xml) fetch table."""
    d = F.col("doc_id")
    k = (d % 23).cast("string")
    block = F.concat(
        F.lit("<url><loc>http://site"), k, F.lit(".example/p"),
        d.cast("string"), F.lit("</loc>"),
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("<lastmod>2026-02-"),
                F.lpad((d % 28 + 1).cast("string"), 2, "0"),
                F.lit("</lastmod>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 6 == 0,
            F.concat(
                F.lit("<priority>0."), (d % 10).cast("string"),
                F.lit("</priority>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    docs = _docs(spark, sf_dir).select(
        (d % 23).alias("k"),
        (d % 2).alias("cls"),
        F.struct(d.alias("doc_id"), block.alias("b")).alias("s"),
    )
    leaves = (
        docs.groupBy("k", "cls")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list("s")), lambda x: x["b"]
                    ),
                    "",
                ),
                F.lit("</urlset>"),
            ).alias("xml")
        )
        .select(
            F.concat(
                F.lit("http://site"), F.col("k").cast("string"),
                F.lit(".example/sm/"),
                F.when(F.col("cls") == 0, "a").otherwise("c"),
                F.lit(".xml"),
            ).alias("loc"),
            "xml",
        )
    )
    i = F.col("id")
    hosts = spark.range(23).select(
        F.concat(F.lit("site"), i.cast("string"), F.lit(".example")).alias(
            "host"
        )
    )
    base = F.concat(F.lit("http://"), F.col("host"), F.lit("/sm/"))
    root = hosts.select(
        F.concat(base, F.lit("root.xml")).alias("loc"),
        F.concat(
            F.lit("<sitemapindex><sitemap><loc>"), base,
            F.lit("a.xml</loc></sitemap><sitemap><loc>"), base,
            F.lit("sub.xml</loc></sitemap><sitemap><loc>"), base,
            F.lit("missing.xml</loc></sitemap></sitemapindex>"),
        ).alias("xml"),
    )
    sub = hosts.select(
        F.concat(base, F.lit("sub.xml")).alias("loc"),
        F.concat(
            F.lit("<sitemapindex><sitemap><loc>"), base,
            F.lit("c.xml</loc></sitemap><sitemap><loc>"), base,
            F.lit("root.xml</loc></sitemap></sitemapindex>"),
        ).alias("xml"),
    )
    roots = hosts.select(
        "host", F.concat(base, F.lit("root.xml")).alias("loc")
    )
    return roots, leaves.unionByName(root).unionByName(sub)


def q_sitemap_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive sitemap expansion end-to-end: every document's URL is
    reachable only through the tree (half at depth 1, half at depth 2
    behind a nested index), so the closed-form oracle over documents
    discriminates missed depth, duplicate emission on the cycle, and
    the unfetched-child path."""
    from spdb_spark.sources.frontier import sitemap_tree_urls

    roots, fetched = _sitemap_tree_fixture(spark, sf_dir)
    return sitemap_tree_urls(roots, fetched)


SQL_SITEMAP_TREE = """
SELECT 'site' || (doc_id % 23)::VARCHAR || '.example' AS host,
       'http://site' || (doc_id % 23)::VARCHAR || '.example/p'
         || doc_id::VARCHAR AS loc,
       CASE WHEN doc_id % 4 = 0
            THEN '2026-02-' || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0')
       END AS lastmod,
       CAST(NULL AS VARCHAR) AS changefreq,
       CASE WHEN doc_id % 6 = 0
            THEN TRY_CAST('0.' || (doc_id % 10)::VARCHAR AS DOUBLE)
       END AS priority
FROM documents
"""


_ST_DELAY = 1.5
_ST_START = 50.0


def q_sitemap_tree_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composition the r13 advice flagged: sitemap_tree_urls keeps
    its own host column and frontier_schedule must REPLACE it (not
    duplicate it) while laying the tree's URLs on politeness slots."""
    from spdb_spark.sources.frontier import (
        frontier_schedule,
        sitemap_tree_urls,
    )

    roots, fetched = _sitemap_tree_fixture(spark, sf_dir)
    tree = sitemap_tree_urls(roots, fetched)
    return frontier_schedule(
        tree,
        url_col="loc",
        default_delay_s=_ST_DELAY,
        start_s=_ST_START,
    )


SQL_SITEMAP_TREE_SCHEDULE = f"""
WITH t AS ({SQL_SITEMAP_TREE})
SELECT loc, lastmod, changefreq, priority, host,
       CAST({_ST_DELAY} AS DOUBLE) AS delay_s,
       row_number() OVER (PARTITION BY host ORDER BY loc) - 1 AS slot,
       CAST({_ST_START} AS DOUBLE)
         + (row_number() OVER (PARTITION BY host ORDER BY loc) - 1)
           * CAST({_ST_DELAY} AS DOUBLE) AS fetch_at_s
FROM t
"""


def q_frontier_robots_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULLY streamed politeness loop against the SAME oracle as
    llm_frontier_schedule: candidate URLs and robots.txt fetches both
    arrive as streams (three url files with rediscoveries, two robots
    files with a refetched host), and schedule(crawl_delays(agent))
    over the two ledgers must equal the batch robots parse -> delay
    selection -> schedule — the shared-oracle stream == batch proof
    with NO static input left in the loop."""
    import hashlib
    import os
    import shutil
    import tempfile

    from spdb_spark.streaming.frontier import (
        StreamingFrontier,
        StreamingRobots,
    )

    urls, rb = _frontier_fixture(spark, sf_dir)
    url_rows = sorted(
        urls.collect(),
        key=lambda r: hashlib.md5(r.source.encode()).hexdigest(),
    )
    files: list[list[tuple]] = [[], [], []]
    for i, r in enumerate(url_rows):
        files[i % 3].append((r.doc_id, r.source))
        if i % 5 == 0:
            files[(i + 1) % 3].append((r.doc_id, r.source))
    rb_rows = sorted(rb.collect(), key=lambda r: r.host)
    rb_files = [rb_rows[::2], rb_rows[1::2] + rb_rows[:1]]  # refetch host 0
    tmp = tempfile.mkdtemp(prefix="frontierrb-")
    try:
        ufeed = os.path.join(tmp, "urls")
        rfeed = os.path.join(tmp, "robots")
        os.makedirs(ufeed)
        os.makedirs(rfeed)
        for j, fl in enumerate(files):
            spark.createDataFrame(
                fl, "doc_id long, source string"
            ).coalesce(1).write.parquet(os.path.join(ufeed, f"f{j}"))
        for j, fl in enumerate(rb_files):
            spark.createDataFrame(
                [(r.host, r.robots_txt) for r in fl],
                "host string, robots_txt string",
            ).coalesce(1).write.parquet(os.path.join(rfeed, f"f{j}"))
        fr = StreamingFrontier(
            spark,
            os.path.join(tmp, "fstate"),
            "doc_id long, source string",
            url_col="source",
        )
        rs = StreamingRobots(spark, os.path.join(tmp, "rstate"))
        fq = fr.start(
            spark.readStream.schema("doc_id long, source string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(ufeed, "*")),
            os.path.join(tmp, "fckpt"),
        )
        rq = rs.start(
            spark.readStream.schema("host string, robots_txt string")
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(rfeed, "*")),
            os.path.join(tmp, "rckpt"),
        )
        try:
            if not (fq.awaitTermination(600) and rq.awaitTermination(600)):
                raise TimeoutError("frontier/robots streams timed out")
        finally:
            fq.stop()
            rq.stop()
        got = (
            fr.schedule(
                rs.crawl_delays(_FS_AGENT),
                default_delay_s=_FS_DEFAULT,
                start_s=_FS_START,
            )
            .select(
                "doc_id", "source", "host", "delay_s", "slot", "fetch_at_s"
            )
            .collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        got,
        "doc_id long, source string, host string, delay_s double,"
        " slot long, fetch_at_s double",
    )


# 2026-03-01T00:00:00Z — the fixed "now" of the recrawl gate.
_RC_NOW = 1772323200


def _recrawl_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-metadata entries from documents covering every recrawl
    branch: lastmod valid/malformed/absent (%3 classes), changefreq
    cycling all six spec values plus 'never', a junk value, and NULL
    (%9 classes), priority present on %5 != 0."""
    d = F.col("doc_id")
    k = (d % 23).cast("string")
    return _docs(spark, sf_dir).select(
        F.concat(F.lit("site"), k, F.lit(".example")).alias("host"),
        F.concat(
            F.lit("http://site"), k, F.lit(".example/d"), d.cast("string")
        ).alias("loc"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("2026-01-"),
                F.lpad((d % 28 + 1).cast("string"), 2, "0"),
            ),
        )
        .when(d % 3 == 1, F.lit("not-a-date"))
        .otherwise(F.lit(None).cast("string"))
        .alias("lastmod"),
        F.element_at(
            F.array(
                F.lit("always"), F.lit("hourly"), F.lit("daily"),
                F.lit("weekly"), F.lit("monthly"), F.lit("yearly"),
                F.lit("never"), F.lit("sometimes"),
                F.lit(None).cast("string"),
            ),
            (d % 9 + 1).cast("int"),
        ).alias("changefreq"),
        F.when(
            d % 5 != 0,
            F.concat(F.lit("0."), (d % 10).cast("string")).try_cast(
                "double"
            ),
        ).alias("priority"),
    )


def q_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-aware recrawl scoring: every (lastmod, changefreq,
    priority) branch — valid/malformed/absent dates, all six spec
    frequencies plus 'never', junk and NULL — against the SQL twin's
    replay of the same scoring."""
    from spdb_spark.sources.frontier import recrawl_priority

    return recrawl_priority(_recrawl_fixture(spark, sf_dir), _RC_NOW)


def _sql_recrawl_priority() -> str:
    from spdb_spark.sources.frontier import recrawl_priority_sql

    entries = """(
SELECT 'site' || (doc_id % 23)::VARCHAR || '.example' AS host,
       'http://site' || (doc_id % 23)::VARCHAR || '.example/d'
         || doc_id::VARCHAR AS loc,
       CASE WHEN doc_id % 3 = 0
            THEN '2026-01-' || lpad((doc_id % 28 + 1)::VARCHAR, 2, '0')
            WHEN doc_id % 3 = 1 THEN 'not-a-date'
       END AS lastmod,
       (['always', 'hourly', 'daily', 'weekly', 'monthly', 'yearly',
         'never', 'sometimes', NULL])[(doc_id % 9 + 1)::INT]
         AS changefreq,
       CASE WHEN doc_id % 5 <> 0
            THEN TRY_CAST('0.' || (doc_id % 10)::VARCHAR AS DOUBLE)
       END AS priority
FROM documents
)"""
    return f"SELECT * FROM {recrawl_priority_sql(entries, _RC_NOW)}"


SQL_RECRAWL_PRIORITY = _sql_recrawl_priority()


_CB_BUDGET = 997  # prime: every host keeps a fractional remainder


def q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder fetch-budget apportionment across the 23
    document hosts, with weight classes covering NULL (%7 hosts), zero
    (%5 hosts) and fractional doubles (doc count + k/10) — the SQL twin
    replays base shares, remainder ranking and the exact-sum property."""
    from spdb_spark.sources.frontier import fetch_budget_allocate

    d = F.col("doc_id")
    hosts = (
        _docs(spark, sf_dir)
        .groupBy((d % 23).alias("k"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.concat(
                F.lit("site"), F.col("k").cast("string"), F.lit(".example")
            ).alias("host"),
            F.when(F.col("k") % 7 == 0, F.lit(None).cast("double"))
            .when(F.col("k") % 5 == 0, F.lit(0.0))
            .otherwise(F.col("cnt") + F.col("k") / F.lit(10.0))
            .alias("weight"),
        )
    )
    return fetch_budget_allocate(hosts, _CB_BUDGET)


def _sql_crawl_budget() -> str:
    from spdb_spark.sources.frontier import fetch_budget_allocate_sql

    hosts = """(
SELECT 'site' || k::VARCHAR || '.example' AS host,
       CASE WHEN k % 7 = 0 THEN NULL
            WHEN k % 5 = 0 THEN 0.0
            ELSE cnt + k / 10.0 END AS weight
FROM (SELECT doc_id % 23 AS k, count(*) AS cnt
      FROM documents GROUP BY doc_id % 23)
)"""
    return f"SELECT * FROM {fetch_budget_allocate_sql(hosts, _CB_BUDGET)}"


SQL_CRAWL_BUDGET = _sql_crawl_budget()


STAGED_R14["llm_recrawl_priority"] = (
    q_recrawl_priority,
    SQL_RECRAWL_PRIORITY,
)
STAGED_R14["llm_crawl_budget"] = (q_crawl_budget, SQL_CRAWL_BUDGET)
STAGED_R14["llm_sitemap_tree"] = (q_sitemap_tree, SQL_SITEMAP_TREE)
STAGED_R14["llm_sitemap_tree_schedule"] = (
    q_sitemap_tree_schedule,
    SQL_SITEMAP_TREE_SCHEDULE,
)
STAGED_R14["llm_frontier_robots_stream"] = (
    q_frontier_robots_stream,
    SQL_FRONTIER_SCHEDULE,
)
