"""Frontier operators (sources/frontier.py): hand-pinned sitemap
parsing (urlset + sitemapindex, missing fields, whitespace), the
politeness schedule's slot/timestamp math and determinism, crawl-delay
twin parity, and the plan shape (broadcast delay join, no corpus
shuffle beyond the per-host window)."""

import duckdb
from pyspark.sql import functions as F

from spdb_spark.sources.frontier import (
    frontier_schedule,
    frontier_schedule_sql,
    sitemap_index_locs,
    sitemap_tree_urls,
    sitemap_tree_urls_sql,
    sitemap_urls,
    sitemap_urls_sql,
)

XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> http://a.example/one </loc>
    <lastmod>2026-01-02</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc>http://a.example/two</loc></url>
  <url><priority>0.5</priority></url>
  <url><loc>http://a.example/three</loc><priority>notanumber</priority></url>
</urlset>
"""

IDX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://a.example/sitemap1.xml</loc>
    <lastmod>2025-12-31</lastmod></sitemap>
  <sitemap><loc>http://a.example/sitemap2.xml</loc></sitemap>
</sitemapindex>
"""


def test_sitemap_urls_hand_pinned(spark):
    df = spark.createDataFrame(
        [("a.example", XML)], "host string, xml string"
    )
    rows = sorted(
        (r.loc, r.lastmod, r.changefreq, r.priority)
        for r in sitemap_urls(df).collect()
    )
    # loc-less entry dropped; whitespace trimmed; bad priority -> NULL
    assert rows == [
        ("http://a.example/one", "2026-01-02", "daily", 0.8),
        ("http://a.example/three", None, None, None),
        ("http://a.example/two", None, None, None),
    ]


def test_sitemap_index_hand_pinned(spark):
    df = spark.createDataFrame(
        [("a.example", IDX)], "host string, xml string"
    )
    rows = sorted(
        (r.loc, r.lastmod) for r in sitemap_index_locs(df).collect()
    )
    assert rows == [
        ("http://a.example/sitemap1.xml", "2025-12-31"),
        ("http://a.example/sitemap2.xml", None),
    ]


def test_sitemap_urls_duckdb_parity(spark):
    df = spark.createDataFrame(
        [("a.example", XML)], "host string, xml string"
    )
    got = sorted(tuple(r) for r in sitemap_urls(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE sm (host VARCHAR, xml VARCHAR)")
    con.execute("INSERT INTO sm VALUES (?, ?)", ["a.example", XML])
    duck = sorted(
        con.execute(f"SELECT * FROM {sitemap_urls_sql('sm')}").fetchall()
    )
    assert got == duck


ESC_XML = """<urlset>
  <url><loc>http://a.example/q?a=1&amp;b=&apos;2&apos;</loc>
    <changefreq>&lt;daily&gt;</changefreq></url>
  <url><loc><![CDATA[http://a.example/cd?x=1&y=2]]></loc></url>
  <url><loc> <![CDATA[ spaced &amp; verbatim ]]> </loc></url>
  <url><loc>http://a.example/amp?e=&amp;lt;</loc></url>
</urlset>
"""


def test_sitemap_entities_and_cdata(spark):
    df = spark.createDataFrame(
        [("a.example", ESC_XML)], "host string, xml string"
    )
    rows = sorted(
        (r.loc, r.changefreq) for r in sitemap_urls(df).collect()
    )
    assert rows == [
        # plain text entity-decodes; CDATA passes verbatim (the inner
        # &amp; does NOT decode, raw & and surrounding-trim apply);
        # &amp;lt; is the LITERAL text "&lt;" (no double decode)
        ("http://a.example/amp?e=&lt;", None),
        ("http://a.example/cd?x=1&y=2", None),
        ("http://a.example/q?a=1&b='2'", "<daily>"),
        ("spaced &amp; verbatim", None),
    ]


def test_sitemap_escapes_duckdb_parity(spark):
    df = spark.createDataFrame(
        [("a.example", ESC_XML)], "host string, xml string"
    )
    got = sorted(tuple(r) for r in sitemap_urls(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE sm (host VARCHAR, xml VARCHAR)")
    con.execute("INSERT INTO sm VALUES (?, ?)", ["a.example", ESC_XML])
    duck = sorted(
        con.execute(f"SELECT * FROM {sitemap_urls_sql('sm')}").fetchall()
    )
    assert got == duck


def _tree_fixture():
    """Root index -> [urlset A, sub-index, missing.xml(not fetched)];
    sub-index -> [urlset C, root again (cycle)]."""
    root = (
        "<sitemapindex>"
        "<sitemap><loc>http://t.example/a.xml</loc></sitemap>"
        "<sitemap><loc>http://t.example/sub.xml</loc></sitemap>"
        "<sitemap><loc>http://t.example/missing.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    sub = (
        "<sitemapindex>"
        "<sitemap><loc>http://t.example/c.xml</loc></sitemap>"
        "<sitemap><loc>http://t.example/root.xml</loc></sitemap>"
        "</sitemapindex>"
    )
    a = (
        "<urlset><url><loc>http://t.example/p1</loc>"
        "<priority>0.9</priority></url>"
        "<url><loc>http://t.example/p2</loc></url></urlset>"
    )
    c = "<urlset><url><loc>http://t.example/p3</loc></url></urlset>"
    fetched = [
        ("http://t.example/root.xml", root),
        ("http://t.example/sub.xml", sub),
        ("http://t.example/a.xml", a),
        ("http://t.example/c.xml", c),
    ]
    roots = [("t.example", "http://t.example/root.xml")]
    return roots, fetched


def test_sitemap_tree_hand_pinned(spark):
    roots_rows, fetched_rows = _tree_fixture()
    roots = spark.createDataFrame(roots_rows, "host string, loc string")
    fetched = spark.createDataFrame(fetched_rows, "loc string, xml string")
    rows = sorted(
        (r.host, r.loc, r.priority)
        for r in sitemap_tree_urls(roots, fetched).collect()
    )
    # depth-2 leaf p3 reached through sub; the root cycle and the
    # unfetched missing.xml add nothing; no duplicates
    assert rows == [
        ("t.example", "http://t.example/p1", 0.9),
        ("t.example", "http://t.example/p2", None),
        ("t.example", "http://t.example/p3", None),
    ]


def test_sitemap_tree_duckdb_parity(spark):
    roots_rows, fetched_rows = _tree_fixture()
    roots = spark.createDataFrame(roots_rows, "host string, loc string")
    fetched = spark.createDataFrame(fetched_rows, "loc string, xml string")
    got = sorted(
        tuple(r) for r in sitemap_tree_urls(roots, fetched).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE rt (host VARCHAR, loc VARCHAR)")
    con.executemany("INSERT INTO rt VALUES (?,?)", roots_rows)
    con.execute("CREATE TABLE fx (loc VARCHAR, xml VARCHAR)")
    con.executemany("INSERT INTO fx VALUES (?,?)", fetched_rows)
    duck = sorted(
        con.execute(
            "SELECT * FROM " + sitemap_tree_urls_sql("rt", "fx")
        ).fetchall()
    )
    assert got == duck


def test_schedule_over_sitemap_urls_composes(spark):
    """The documented composition: sitemap_urls keeps its own host
    column, and frontier_schedule REPLACES it (recomputed from the URL)
    instead of emitting an ambiguous duplicate."""
    df = spark.createDataFrame(
        [("a.example", XML)], "host string, xml string"
    )
    out = frontier_schedule(sitemap_urls(df), url_col="loc")
    assert out.columns.count("host") == 1
    # by-name downstream use works (this raised AMBIGUOUS_REFERENCE
    # before the fix)
    hosts = sorted(r.host for r in out.select("host").collect())
    assert hosts == ["a.example"] * 3


def test_frontier_schedule_hand_pinned(spark):
    urls = spark.createDataFrame(
        [
            (1, "http://a.example/p2"),
            (2, "http://a.example/p1"),
            (3, "http://a.example/p3"),
            (4, "http://b.example/x"),
            (5, "http://c.example/y"),
        ],
        "doc_id long, url string",
    )
    delays = spark.createDataFrame(
        [("a.example", 1.5), ("b.example", 10.0)],
        "host string, delay_s double",
    )
    got = {
        r.doc_id: (r.host, r.delay_s, r.slot, r.fetch_at_s)
        for r in frontier_schedule(
            urls, delays, default_delay_s=2.0, start_s=100.0
        ).collect()
    }
    # slots follow url order within host; c.example gets the default
    assert got == {
        2: ("a.example", 1.5, 0, 100.0),
        1: ("a.example", 1.5, 1, 101.5),
        3: ("a.example", 1.5, 2, 103.0),
        4: ("b.example", 10.0, 0, 100.0),
        5: ("c.example", 2.0, 0, 100.0),
    }
    # deterministic: a repartitioned re-run yields the identical schedule
    again = {
        r.doc_id: (r.host, r.delay_s, r.slot, r.fetch_at_s)
        for r in frontier_schedule(
            urls.repartition(7), delays, default_delay_s=2.0, start_s=100.0
        ).collect()
    }
    assert again == got


def test_frontier_schedule_duckdb_parity(spark):
    url_rows = [
        (i, f"http://h{i % 3}.example/p{i * 7 % 13}") for i in range(20)
    ]
    delay_rows = [("h0.example", 0.5), ("h2.example", 3.0)]
    urls = spark.createDataFrame(url_rows, "doc_id long, url string")
    delays = spark.createDataFrame(
        delay_rows, "host string, delay_s double"
    )
    got = sorted(
        tuple(r)
        for r in frontier_schedule(urls, delays, start_s=7.0).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE u (doc_id BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?,?)", url_rows)
    con.execute("CREATE TABLE dl (host VARCHAR, delay_s DOUBLE)")
    con.executemany("INSERT INTO dl VALUES (?,?)", delay_rows)
    duck = sorted(
        con.execute(
            "SELECT doc_id, url, host, delay_s, slot, fetch_at_s FROM "
            + frontier_schedule_sql("u", "dl", "url", 1.0, 7.0)
        ).fetchall()
    )
    assert got == duck


def test_recrawl_priority_hand_pinned(spark):
    from spdb_spark.sources.frontier import recrawl_priority

    now = 20513 * 86400  # 2026-03-01
    rows = [
        # (loc, lastmod, changefreq, priority)
        ("u1", "2026-02-28", "daily", 1.0),    # age 1d = period -> due
        ("u2", "2026-02-28", "weekly", 1.0),   # age < period -> not due
        ("u3", "2026-01-01", "weekly", 0.8),   # 59d/7d -> capped 2.0
        ("u4", None, "daily", None),           # no lastmod -> due, cap
        ("u5", "2026-02-28", "never", 0.9),    # archived: never due, 0
        ("u6", "junk", "daily", 0.5),          # malformed -> like absent
        ("u7", "2026-02-28", "always", 0.5),   # period 0: due, cap
        ("u8", "2026-02-28", "sometimes", 1.0),  # junk freq -> weekly
        ("u9", "2026-02-28", None, 1.0),       # absent freq -> weekly
    ]
    df = spark.createDataFrame(
        rows, "loc string, lastmod string, changefreq string,"
        " priority double"
    )
    got = {
        r.loc: (r.period_s, r.age_s, r.due, r.recrawl_score)
        for r in recrawl_priority(df, now).collect()
    }
    day = 86400
    assert got["u1"] == (day, day, True, 1.0 * 1.0)
    assert got["u2"] == (7 * day, day, False, 1.0 * (1 / 7))
    assert got["u3"] == (7 * day, 59 * day, True, 0.8 * 2.0)
    assert got["u4"] == (day, None, True, 0.5 * 2.0)
    assert got["u5"] == (None, day, False, 0.0)
    assert got["u6"] == (day, None, True, 0.5 * 2.0)
    assert got["u7"] == (0, day, True, 0.5 * 2.0)
    assert got["u8"] == (7 * day, day, False, 1.0 * (1 / 7))
    assert got["u9"] == (7 * day, day, False, 1.0 * (1 / 7))


def test_recrawl_priority_duckdb_parity(spark):
    from spdb_spark.sources.frontier import (
        recrawl_priority,
        recrawl_priority_sql,
    )

    now = 20513 * 86400
    rows = [
        (
            f"u{i}",
            ["2026-02-10", "bad", None][i % 3],
            ["always", "hourly", "daily", "weekly", "monthly", "yearly",
             "never", "junk", None][i % 9],
            [None, 0.3, 0.9][i % 3],
        )
        for i in range(27)
    ]
    df = spark.createDataFrame(
        rows, "loc string, lastmod string, changefreq string,"
        " priority double"
    )
    got = sorted(
        tuple(r) for r in recrawl_priority(df, now).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (loc VARCHAR, lastmod VARCHAR,"
        " changefreq VARCHAR, priority DOUBLE)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?,?)", rows)
    duck = sorted(
        con.execute(
            "SELECT * FROM " + recrawl_priority_sql("e", now)
        ).fetchall()
    )
    assert got == duck


def test_fetch_budget_hand_pinned(spark):
    from spdb_spark.sources.frontier import fetch_budget_allocate

    hosts = spark.createDataFrame(
        [("a", 3.0), ("b", 3.0), ("c", 3.0), ("d", 0.0), ("e", None)],
        "host string, weight double",
    )
    got = {
        r.host: r.fetch_budget
        for r in fetch_budget_allocate(hosts, 10).collect()
    }
    # 10 * 3/9 = 3.33.. each -> base 3; one leftover unit goes to the
    # tied largest remainder with the smallest host name
    assert got == {"a": 4, "b": 3, "c": 3, "d": 0, "e": 0}
    assert sum(got.values()) == 10

    # exact division leaves no remainder units
    even = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0)], "host string, weight double"
    )
    got2 = {
        r.host: r.fetch_budget
        for r in fetch_budget_allocate(even, 8).collect()
    }
    assert got2 == {"a": 4, "b": 4}

    # no positive weight -> nothing allocated
    none = spark.createDataFrame(
        [("a", 0.0), ("b", None)], "host string, weight double"
    )
    got3 = {
        r.host: r.fetch_budget
        for r in fetch_budget_allocate(none, 5).collect()
    }
    assert got3 == {"a": 0, "b": 0}


def test_fetch_budget_duckdb_parity(spark):
    from spdb_spark.sources.frontier import (
        fetch_budget_allocate,
        fetch_budget_allocate_sql,
    )

    rows = [
        (f"h{i:02d}", [None, 0.0, float(i), i + 0.37][i % 4])
        for i in range(19)
    ]
    hosts = spark.createDataFrame(rows, "host string, weight double")
    got = sorted(
        tuple(r) for r in fetch_budget_allocate(hosts, 101).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE hw (host VARCHAR, weight DOUBLE)")
    con.executemany("INSERT INTO hw VALUES (?,?)", rows)
    duck = sorted(
        con.execute(
            "SELECT * FROM " + fetch_budget_allocate_sql("hw", 101)
        ).fetchall()
    )
    assert got == duck
    assert sum(b for _, _, b in [(h, w, b) for (h, w, b) in got]) == 101


def test_frontier_plan_broadcasts_delays(spark):
    urls = spark.createDataFrame(
        [(i, f"http://h{i % 5}.example/p{i}") for i in range(50)],
        "doc_id long, url string",
    )
    delays = spark.createDataFrame(
        [("h0.example", 0.5)], "host string, delay_s double"
    )
    plan = (
        frontier_schedule(urls, delays)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
