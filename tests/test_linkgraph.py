"""Host link-graph extraction (functions/linkgraph.py) and its
building blocks (html_href_targets, url_resolve): hand-pinned
semantics, DuckDB twin parity, rank-prior attachment, and the plan
shape that matters at crawl scale (no corpus-keyed shuffle beyond the
distinct-hosts exchange and the final edge groupBy)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.html import href_targets_sql, html_href_targets
from spdb_spark.functions.linkgraph import (
    host_graph_edges,
    host_graph_edges_sql,
    page_links,
)
from spdb_spark.functions.url import url_resolve, url_resolve_sql

_HTML = (
    '<html><body><p>prose</p><div>'
    '<a href="http://a.example/p?x=1&amp;y=2">dq</a>'
    "<a href='/rooted'>sq</a>"
    "<a href=rel.html>uq</a>"
    '<a data-href="decoy.html">not a link</a>'
    '<A HREF="//proto.example/q#f">caps</A>'
    '<a href="mailto:x@y.example">mail</a>'
    '<a href="">empty</a>'
    '<a class="c" href="two.html">attrs</a>'
    '<!-- <a href="commented.html">gone</a> -->'
    "<script>var s = '<a href=\"scripted.html\">gone</a>';</script>"
    "</div></body></html>"
)
_BASE = "https://host.example/dir/page.html?q=1#top"


def test_href_targets_hand_pinned(spark):
    got = (
        spark.createDataFrame([(_HTML,)], "html string")
        .select(html_href_targets(F.col("html")).alias("h"))
        .collect()[0]
        .h
    )
    assert sorted(got) == sorted(
        [
            "http://a.example/p?x=1&y=2",  # &amp; unescaped
            "/rooted",
            "rel.html",
            "//proto.example/q#f",
            "mailto:x@y.example",
            "two.html",
        ]
    )


def test_href_targets_duckdb_parity(spark):
    got = (
        spark.createDataFrame([(_HTML,)], "html string")
        .select(html_href_targets(F.col("html")).alias("h"))
        .collect()[0]
        .h
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT ? AS html", [_HTML])
    want = con.execute(f"SELECT {href_targets_sql('html')} FROM t").fetchone()[0]
    assert sorted(got) == sorted(want)


_RESOLVE_CASES = [
    ("http://h.ex", "a.html", "http://h.ex/a.html"),
    ("http://h.ex/", "a.html", "http://h.ex/a.html"),
    ("http://h.ex/d/p.html", "q.html", "http://h.ex/d/q.html"),
    ("http://h.ex/d/p.html?x=1", "q.html", "http://h.ex/d/q.html"),
    ("http://h.ex/d/p.html", "?x=2", "http://h.ex/d/p.html?x=2"),
    ("http://h.ex/d/p.html#z", "", "http://h.ex/d/p.html"),
    ("http://h.ex/d/p.html", "#z", "http://h.ex/d/p.html"),
    ("http://h.ex/d/p", "/abs", "http://h.ex/abs"),
    ("http://h.ex/d/p", "//o.ex/q", "http://o.ex/q"),
    ("https://h.ex/d/p", "//o.ex/q", "https://o.ex/q"),
    ("http://h.ex/d/p", "HtTpS://x.ex/y", "HtTpS://x.ex/y"),
    ("http://h.ex/d/p", "mailto:a@b.c", "mailto:a@b.c"),
    # documented approximation: dot-segments are NOT collapsed (the
    # authority — all a host graph reads — is exact regardless)
    ("https://h.ex/d/", "../up.html", "https://h.ex/d/../up.html"),
]


def test_url_resolve_hand_pinned(spark):
    df = spark.createDataFrame(
        [(b, h) for b, h, _ in _RESOLVE_CASES], "b string, h string"
    )
    got = [
        r.r
        for r in df.select(
            url_resolve(F.col("b"), F.col("h")).alias("r")
        ).collect()
    ]
    assert got == [want for _, _, want in _RESOLVE_CASES]


def test_url_resolve_duckdb_parity(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE c (b VARCHAR, h VARCHAR)")
    con.executemany(
        "INSERT INTO c VALUES (?, ?)", [(b, h) for b, h, _ in _RESOLVE_CASES]
    )
    duck = [
        r[0]
        for r in con.execute(
            f"SELECT {url_resolve_sql('b', 'h')} FROM c"
        ).fetchall()
    ]
    assert duck == [want for _, _, want in _RESOLVE_CASES]


@pytest.fixture()
def pages(spark):
    rows = [
        # a.site.example links out to b.example twice (two pages), to a
        # subdomain of c.example once, and to itself (dropped)
        (
            "http://a.site.example/p1",
            '<p><a href="http://b.example/x">1</a>'
            '<a href="/self">s</a></p>',
        ),
        (
            "http://a.site.example/p2",
            "<p><a href='//b.example/y'>2</a>"
            "<a href=https://w.c.example/z>3</a></p>",
        ),
        # b.example links back to site.example via a subdomain spelling
        (
            "http://b.example/h",
            '<p><a href="http://deep.a.site.example/q">4</a>'
            '<a href="mailto:x@c.example">m</a></p>',
        ),
    ]
    return spark.createDataFrame(rows, "page_url string, html string")


def test_page_links_resolves_and_filters(pages):
    got = sorted(
        (r.page_url, r.link_url, r.dst_host)
        for r in page_links(pages).collect()
    )
    assert got == sorted(
        [
            ("http://a.site.example/p1", "http://b.example/x", "b.example"),
            ("http://a.site.example/p1", "http://a.site.example/self", "a.site.example"),
            ("http://a.site.example/p2", "http://b.example/y", "b.example"),
            ("http://a.site.example/p2", "https://w.c.example/z", "w.c.example"),
            ("http://b.example/h", "http://deep.a.site.example/q", "deep.a.site.example"),
        ]
    )


def test_host_graph_edges_collapses_and_weights(pages):
    got = sorted(
        (r.src_domain, r.dst_domain, r.weight)
        for r in host_graph_edges(pages).collect()
    )
    # 'example' is unlisted -> default PSL rule: domain = last 2 labels.
    # a.site.example -> site.example; w.c.example -> c.example;
    # deep.a.site.example -> site.example; /self collapses to a self
    # edge at eTLD+1 and is dropped.
    assert got == [
        ("b.example", "site.example", 1),
        ("site.example", "b.example", 2),
        ("site.example", "c.example", 1),
    ]


def test_host_graph_edges_duckdb_parity(pages):
    got = sorted(
        (r.src_domain, r.dst_domain, int(r.weight))
        for r in host_graph_edges(pages).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pages (page_url VARCHAR, html VARCHAR)")
    con.executemany(
        "INSERT INTO pages VALUES (?, ?)",
        [(r.page_url, r.html) for r in pages.collect()],
    )
    duck = sorted(
        (a, b, int(w))
        for a, b, w in con.execute(
            f"SELECT * FROM {host_graph_edges_sql('pages')}"
        ).fetchall()
    )
    assert got == duck


def test_host_graph_keep_self_edges(pages):
    got = {
        (r.src_domain, r.dst_domain): r.weight
        for r in host_graph_edges(pages, drop_self=False).collect()
    }
    assert got[("site.example", "site.example")] == 1


def test_attach_host_rank_and_floor(spark):
    from spdb_spark.sources.crawl import attach_host_rank

    docs = spark.createDataFrame(
        [
            (1, "http://a.site.example/d1"),
            (2, "http://b.example/d2"),
            (3, "http://unranked.example/d3"),
        ],
        "doc_id long, source string",
    )
    ranks = spark.createDataFrame(
        [("site.example", 700), ("b.example", 300)], "domain string, rank_q long"
    )
    got = {
        r.doc_id: r.host_rank_q
        for r in attach_host_rank(docs, ranks).collect()
    }
    assert got == {1: 700, 2: 300, 3: 0}


def test_crawl_host_ranks_end_to_end(spark):
    """Tiny two-host crawl: the hub that every page links to outranks
    the page nobody cites; ranks come out in exact micro-units."""
    from spdb_spark.sources.crawl import crawl_host_ranks

    def resp(uri, html):
        body = "HTTP/1.1 200 OK\r\n\r\n" + html
        return ("response", uri, bytearray(body.encode()))

    warc = spark.createDataFrame(
        [
            resp("http://one.example/a", '<a href="http://hub.example/">h</a>'),
            resp("http://two.example/b", '<a href="http://hub.example/">h</a>'),
            resp("http://hub.example/", "<p>no links</p>"),
            ("request", "http://one.example/a", bytearray(b"ignored")),
        ],
        "warc_type string, target_uri string, payload binary",
    )
    ranks = {
        r.domain: r.rank_q for r in crawl_host_ranks(warc, iterations=2).collect()
    }
    assert set(ranks) == {"one.example", "two.example", "hub.example"}
    assert ranks["hub.example"] > ranks["one.example"]
    assert ranks["one.example"] == ranks["two.example"]


def test_edge_build_has_no_rowudf_or_cartesian(pages):
    plan = host_graph_edges(pages)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
