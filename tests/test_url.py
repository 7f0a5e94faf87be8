"""URL normalization tests: hand-pinned canonical forms and DuckDB
oracle parity (the r7 gate contract)."""

import duckdb
from pyspark.sql import functions as F

from spdb_spark.functions.url import (
    url_host,
    url_host_sql,
    url_normalize,
    url_normalize_sql,
)

CASES = [
    # (input, normalized, host)
    ("http://Example.COM/Path?a=1", "http://example.com/Path?a=1", "example.com"),
    ("HTTP://WWW.X.ORG:80/a#frag", "http://www.x.org/a", "www.x.org"),
    ("https://x.org:443/", "https://x.org/", "x.org"),
    ("https://x.org:8443/", "https://x.org:8443/", "x.org"),
    ("http://x.org/p?utm_source=tw&q=1", "http://x.org/p?q=1", "x.org"),
    ("http://x.org/p?q=1&utm_medium=m", "http://x.org/p?q=1", "x.org"),
    ("http://x.org/p?utm_a=1&utm_b=2", "http://x.org/p", "x.org"),
    ("http://x.org/p?utm_a=1&utm_b=2&q=3", "http://x.org/p?q=3", "x.org"),
    ("http://x.org/p?a=1&fbclid=XYZ&b=2", "http://x.org/p?a=1&b=2", "x.org"),
    ("http://x.org/p?gclid=1", "http://x.org/p", "x.org"),
    ("http://x.org/?ref=hn#top", "http://x.org/", "x.org"),
    ("http://u:pw@X.org/p", "http://u:pw@x.org/p", "x.org"),
    ("not a url at all", "not a url at all", ""),
    ("ftp://Host/File", "ftp://host/File", "host"),
    ("http://x.org/CaseKept/Path", "http://x.org/CaseKept/Path", "x.org"),
    ("http://x.org:80", "http://x.org", "x.org"),
]


def test_hand_pinned_normalization(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "id long, url string"
    )
    rows = {
        r["id"]: (r["n"], r["h"])
        for r in df.select(
            "id",
            url_normalize(F.col("url")).alias("n"),
            url_host(F.col("url")).alias("h"),
        ).collect()
    }
    for i, (u, want_n, want_h) in enumerate(CASES):
        assert rows[i] == (want_n, want_h), (u, rows[i], (want_n, want_h))


def test_duckdb_oracle_parity(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)], "id long, url string"
    )
    got = {
        r["id"]: (r["n"], r["h"])
        for r in df.select(
            "id",
            url_normalize(F.col("url")).alias("n"),
            url_host(F.col("url")).alias("h"),
        ).collect()
    }
    con = duckdb.connect()
    sql = (
        f"SELECT {url_normalize_sql('u')}, {url_host_sql('u')}"
        " FROM (SELECT ? AS u)"
    )
    for i, (u, _, _) in enumerate(CASES):
        want = con.execute(sql, [u]).fetchone()
        assert got[i] == tuple(want), (u, got[i], want)


def test_normalization_collapses_refetch_ids(spark):
    # same page under three spellings -> ONE doc_id after normalization
    from spdb_spark.functions.hashing import md5_long

    spellings = [
        "http://Example.com/a?utm_source=x",
        "HTTP://example.COM:80/a",
        "http://example.com/a#section",
    ]
    df = spark.createDataFrame([(u,) for u in spellings], "url string")
    n = (
        df.select(md5_long(url_normalize(F.col("url"))).alias("id"))
        .distinct()
        .count()
    )
    assert n == 1


def test_warc_normalize_urls_option(spark, tmp_path):
    from spdb_spark.sources.warc import (
        ingest_warc,
        warc_encode,
        warc_responses_to_docs,
    )

    body = b"HTTP/1.1 200 OK\r\n\r\n<p>the same page body full of words</p>"
    recs = [
        {"warc_type": "response", "target_uri": u, "payload": body}
        for u in (
            "http://Example.com/a?utm_source=x",
            "HTTP://example.COM:80/a",
            "http://example.com/a#sec",
        )
    ]
    (tmp_path / "s.warc.gz").write_bytes(warc_encode(recs))
    warc = ingest_warc(spark, str(tmp_path))
    assert warc_responses_to_docs(warc).count() == 3  # spellings kept apart
    docs = warc_responses_to_docs(warc, normalize_urls=True)
    rows = docs.collect()
    assert len(rows) == 1  # collapsed like an exact revisit
    assert rows[0]["source"] == "http://example.com/a"


def test_cap_per_host_deterministic(spark):
    from spdb_spark.sources.crawl import cap_per_host

    rows = [
        (i, f"doc body {i}", f"http://host{i % 3}.org/p{i}") for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    capped = cap_per_host(docs, 4)
    by_host = (
        capped.groupBy(F.expr("regexp_extract(source, 'host\\\\d', 0)"))
        .count()
        .collect()
    )
    assert sorted(r["count"] for r in by_host) == [4, 4, 4]
    # pure function of the corpus: repartitioning keeps the same survivors
    a = {r["doc_id"] for r in capped.collect()}
    b = {r["doc_id"] for r in cap_per_host(docs.repartition(7), 4).collect()}
    assert a == b
    # under-quota hosts keep everything
    assert cap_per_host(docs, 100).count() == 30


def test_cap_per_host_salted_equals_single_window(spark):
    """The salted two-phase top-k keeps EXACTLY the same set as the
    salt=1 single-window form (global top-k per key is a subset of the
    union of local bucket top-ks), for several salts and cap sizes."""
    from spdb_spark.sources.crawl import cap_per_host

    rows = [
        (i, f"doc body {i}", f"http://host{i % 3}.org/p{i}")
        for i in range(200)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    for cap in (1, 4, 37):
        want = {r["doc_id"] for r in cap_per_host(docs, cap, salt=1).collect()}
        for s in (2, 16, 64):
            got = {
                r["doc_id"] for r in cap_per_host(docs, cap, salt=s).collect()
            }
            assert got == want, (cap, s)
