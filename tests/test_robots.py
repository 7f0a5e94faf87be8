"""robots.txt exclusion (functions/robots.py): hand-pinned RFC 9309
semantics (group formation, agent selection, wildcard/anchor patterns,
longest-match precedence, allow-wins-tie, empty-disallow), DuckDB twin
parity, and the plan shape (broadcast rule join, no corpus shuffle)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.robots import (
    robots_filter,
    robots_filter_sql,
    robots_rules,
    robots_rules_sql,
    url_path,
)

RB = """# test file
User-agent: trainingbot
Disallow: /private
Allow: /private/ok
Disallow: /tmp*
Disallow: /exact$
Crawl-delay: 5

User-agent: otherbot
User-agent: *
Disallow: /
Allow: /pub
"""
RB_ALLOW_ALL = "User-agent: *\nDisallow:\n"

DOCS = [
    (1, "http://a.example/private/x", False),    # prefix disallow
    (2, "http://a.example/private/ok/page", True),  # longer allow wins
    (3, "http://a.example/tmpfile", False),      # '*' wildcard
    (4, "http://a.example/exact", False),        # '$' anchor hits
    (5, "http://a.example/exactly", True),       # '$' anchor misses
    (6, "http://a.example/open", True),          # no rule -> allowed
    (7, "http://b.example/anything", True),      # empty Disallow: = all ok
    (8, "http://c.example/norobots", True),      # host without robots
    (9, "http://a.example", True),               # bare host -> path '/'
]


@pytest.fixture()
def fixture(spark):
    robots = spark.createDataFrame(
        [("a.example", RB), ("b.example", RB_ALLOW_ALL)],
        "host string, robots_txt string",
    )
    docs = spark.createDataFrame(
        [(i, u) for i, u, _ in DOCS], "doc_id long, source string"
    )
    return docs, robots


def test_rules_parse_groups(spark, fixture):
    _, robots = fixture
    rows = robots_rules(robots).collect()
    # trainingbot group: 4 rules; otherbot+* share a group: 2 rules x 2
    # agents; allow-all host: 1 empty rule under '*'
    by_agent = {}
    for r in rows:
        by_agent.setdefault((r.host, r.agent), []).append(
            (r.rule_type, r.pattern)
        )
    assert len(by_agent[("a.example", "trainingbot")]) == 4
    assert sorted(by_agent[("a.example", "*")]) == [
        ("allow", "/pub"),
        ("disallow", "/"),
    ]
    assert by_agent[("a.example", "otherbot")] == by_agent[("a.example", "*")]
    assert by_agent[("b.example", "*")] == [("disallow", "")]


def test_filter_hand_pinned(spark, fixture):
    docs, robots = fixture
    got = {
        r.doc_id: r.allowed
        for r in robots_filter(
            docs, robots, "TrainingBot", keep_verdict=True
        ).collect()
    }
    assert got == {i: a for i, _, a in DOCS}
    kept = {
        r.doc_id
        for r in robots_filter(docs, robots, "TrainingBot").collect()
    }
    assert kept == {i for i, _, a in DOCS if a}


def test_unknown_agent_falls_to_star_group(spark, fixture):
    docs, robots = fixture
    got = {
        r.doc_id: r.allowed
        for r in robots_filter(
            docs, robots, "somebot", keep_verdict=True
        ).collect()
    }
    # a.example's '*' group: Disallow / (len 1) vs Allow /pub; none of
    # the fixture paths start with /pub -> everything on a.example is
    # blocked; b/c.example unaffected
    for i, u, _ in DOCS:
        assert got[i] == (not u.startswith("http://a.example")), u


def test_duckdb_twin_parity(spark, fixture):
    docs, robots = fixture
    con = duckdb.connect()
    con.execute("CREATE TABLE robots (host VARCHAR, robots_txt VARCHAR)")
    con.executemany(
        "INSERT INTO robots VALUES (?, ?)",
        [(r.host, r.robots_txt) for r in robots.collect()],
    )
    con.execute("CREATE TABLE docs (doc_id BIGINT, source VARCHAR)")
    con.executemany(
        "INSERT INTO docs VALUES (?, ?)", [(i, u) for i, u, _ in DOCS]
    )
    duck_rules = sorted(
        con.execute(
            f"SELECT host, grp, agent, rule_type, pattern, pattern_len"
            f" FROM {robots_rules_sql('robots')}"
        ).fetchall()
    )
    spark_rules = sorted(tuple(r) for r in robots_rules(robots).collect())
    assert duck_rules == spark_rules
    duck_v = dict(
        con.execute(
            f"SELECT doc_id, allowed FROM "
            f"{robots_filter_sql('docs', 'robots', 'TrainingBot')}"
        ).fetchall()
    )
    spark_v = {
        r.doc_id: r.allowed
        for r in robots_filter(
            docs, robots, "TrainingBot", keep_verdict=True
        ).collect()
    }
    assert duck_v == spark_v


def test_url_path_extraction(spark):
    df = spark.createDataFrame(
        [
            ("http://h.ex/a/b?q=1",),
            ("https://h.ex",),
            ("http://h.ex/",),
        ],
        "u string",
    )
    got = [r.p for r in df.select(url_path(F.col("u")).alias("p")).collect()]
    assert got == ["/a/b?q=1", "/", "/"]


def test_filter_plan_broadcasts_rules(spark, fixture):
    docs, robots = fixture
    plan = (
        robots_filter(docs, robots, "trainingbot", keep_verdict=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_crawl_to_corpus_robots_stage(spark):
    """robots exclusion composes into crawl_to_corpus: disallowed pages
    never reach the corpus, allowed pages are untouched."""
    from spdb_spark.sources.crawl import crawl_to_corpus

    def body(word: str) -> bytearray:
        # the distinguishing word sits INSIDE the main block — outside
        # it would be its own 1-word block, dropped by extraction, and
        # exact dedup would collapse the then-identical texts
        prose = (
            "we have the words to pass the gopher floor and this page "
            "carries enough prose that the quality stage keeps it with "
            "plenty of stopwords in it to be sure of that outcome today "
        ) * 3
        return bytearray(
            (
                "HTTP/1.1 200 OK\r\n\r\n<html><body><p>"
                + prose
                + word
                + "</p></body></html>"
            ).encode()
        )

    warc = spark.createDataFrame(
        [
            ("response", "http://a.example/private/doc1", body("one")),
            ("response", "http://a.example/pub/doc2", body("two")),
            ("response", "http://b.example/doc3", body("three")),
        ],
        "warc_type string, target_uri string, payload binary",
    )
    robots = spark.createDataFrame(
        [("a.example", "User-agent: *\nDisallow: /private\n")],
        "host string, robots_txt string",
    )
    out = crawl_to_corpus(
        warc, near_dedup=False, materialize=False, robots=robots
    )
    srcs = {r.source for r in out.collect()}
    assert srcs == {"http://a.example/pub/doc2", "http://b.example/doc3"}


def test_filter_is_streaming_safe(spark, tmp_path, fixture):
    """The fold form has no corpus-side aggregation, so the SAME
    operator runs on a readStream (stream-static broadcast join) and
    yields the batch verdicts."""
    import os

    docs, robots = fixture
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, source string")
        .parquet(src)
    )
    out_dir = str(tmp_path / "out")
    q = (
        robots_filter(stream, robots, "trainingbot", keep_verdict=True)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {
        r.doc_id: r.allowed
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r.doc_id: r.allowed
        for r in robots_filter(
            docs, robots, "trainingbot", keep_verdict=True
        ).collect()
    }
    assert got == want


def test_crawl_delays_and_sitemaps(spark):
    from spdb_spark.functions.robots import (
        robots_crawl_delays,
        robots_sitemaps,
    )

    rb = (
        "Sitemap: http://a.example/sitemap.xml\n"
        "User-agent: trainingbot\n"
        "Crawl-delay: 2.5\n"
        "Disallow: /x\n"
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 10\n"
        "Sitemap: http://a.example/extra.xml\n"
    )
    rb2 = "User-agent: *\nDisallow:\n"  # no delay, no sitemap
    rb3 = "User-agent: *\nCrawl-delay: soon\n"  # non-numeric -> dropped
    robots = spark.createDataFrame(
        [("a.example", rb), ("b.example", rb2), ("c.example", rb3)],
        "host string, robots_txt string",
    )
    got = {
        r.host: r.delay_s
        for r in robots_crawl_delays(robots, "TrainingBot").collect()
    }
    assert got == {"a.example": 2.5}
    got_star = {
        r.host: r.delay_s
        for r in robots_crawl_delays(robots, "somebot").collect()
    }
    assert got_star == {"a.example": 10.0}
    maps = {
        (r.host, r.sitemap) for r in robots_sitemaps(robots).collect()
    }
    assert maps == {
        ("a.example", "http://a.example/sitemap.xml"),
        ("a.example", "http://a.example/extra.xml"),
    }


def test_longest_prefix_agent_selection(spark):
    """RFC 9309 / Googlebot convention: among agent values that are a
    prefix of the product token the LONGEST wins; values longer than
    the token never match."""
    rb = (
        "User-agent: training\n"
        "Disallow: /a\n"
        "\n"
        "User-agent: trainingbot\n"
        "Disallow: /b\n"
        "\n"
        "User-agent: trainingbot-images\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    robots = spark.createDataFrame(
        [("h.example", rb)], "host string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [(1, "http://h.example/a"), (2, "http://h.example/b"),
         (3, "http://h.example/c")],
        "doc_id long, source string",
    )

    def verdicts(agent):
        return {
            r.doc_id: r.allowed
            for r in robots_filter(
                docs, robots, agent, keep_verdict=True
            ).collect()
        }

    # exact group beats the shorter prefix; the longer decoy is ignored
    assert verdicts("TrainingBot") == {1: True, 2: False, 3: True}
    # only the short prefix matches this token
    assert verdicts("trainingbo") == {1: False, 2: True, 3: True}
    # nothing matches -> '*' group blocks all
    assert verdicts("otherbot") == {1: False, 2: False, 3: False}
    # the most specific token picks its own group
    assert verdicts("trainingbot-images") == {1: False, 2: False, 3: False}


def test_matching_groups_combine(spark):
    """Two separate groups naming the same agent combine their rules
    (RFC: matching groups' rules MUST be combined)."""
    rb = (
        "User-agent: trainingbot\n"
        "Disallow: /a\n"
        "\n"
        "User-agent: other\n"
        "Disallow: /c\n"
        "\n"
        "User-agent: trainingbot\n"
        "Disallow: /b\n"
    )
    robots = spark.createDataFrame(
        [("h.example", rb)], "host string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [(1, "http://h.example/a"), (2, "http://h.example/b"),
         (3, "http://h.example/c")],
        "doc_id long, source string",
    )
    got = {
        r.doc_id: r.allowed
        for r in robots_filter(
            docs, robots, "trainingbot", keep_verdict=True
        ).collect()
    }
    assert got == {1: False, 2: False, 3: True}


def test_ruleless_matched_group_allows_all(spark):
    """A selected group whose lines are all non-rule directives allows
    everything — it must NOT fall through to the blocking '*' group,
    and its directive lines still bound the groups around it."""
    rb = (
        "User-agent: trainingbot\n"
        "Crawl-delay: 1\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    robots = spark.createDataFrame(
        [("h.example", rb)], "host string, robots_txt string"
    )
    docs = spark.createDataFrame(
        [(1, "http://h.example/x")], "doc_id long, source string"
    )
    got = robots_filter(docs, robots, "trainingbot", keep_verdict=True)
    assert [(r.doc_id, r.allowed) for r in got.collect()] == [(1, True)]
    # the '*' group still blocks everyone else
    got2 = robots_filter(docs, robots, "somebot", keep_verdict=True)
    assert [(r.doc_id, r.allowed) for r in got2.collect()] == [(1, False)]


def test_crawl_delay_group_boundaries(spark):
    """A rules-only group followed by a crawl-delay-only group must NOT
    merge: agent a has no delay, agent b has 5 (the lag-over-filtered-
    keys bug assigned b's delay to a)."""
    from spdb_spark.functions.robots import robots_crawl_delays

    rb = (
        "User-agent: aaaa\n"
        "Disallow: /x\n"
        "User-agent: bbbb\n"
        "Crawl-delay: 5\n"
    )
    robots = spark.createDataFrame(
        [("h.example", rb)], "host string, robots_txt string"
    )
    assert robots_crawl_delays(robots, "aaaa").collect() == []
    got = {
        r.host: r.delay_s
        for r in robots_crawl_delays(robots, "bbbb").collect()
    }
    assert got == {"h.example": 5.0}


def test_prefix_selection_duckdb_parity(spark):
    """The SQL twin replays the longest-prefix pick, group combining,
    and the rule-less-group allow-all byte-for-byte."""
    import duckdb as _duck

    rb_prefix = (
        "User-agent: training\n"
        "Disallow: /a\n"
        "\n"
        "User-agent: trainingbot-images\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    rb_ruleless = (
        "User-agent: trainingbot\n"
        "Crawl-delay: 1\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /\n"
    )
    rb_combine = (
        "User-agent: trainingbot\n"
        "Disallow: /a\n"
        "User-agent: other\n"
        "Disallow: /c\n"
        "User-agent: trainingbot\n"
        "Disallow: /b\n"
    )
    robots_rows = [
        ("p.example", rb_prefix),
        ("r.example", rb_ruleless),
        ("c.example", rb_combine),
    ]
    doc_rows = [
        (i * 10 + j, f"http://{h}/{p}")
        for i, (h, _) in enumerate(robots_rows)
        for j, p in enumerate(("a", "b", "c"))
    ]
    robots = spark.createDataFrame(
        robots_rows, "host string, robots_txt string"
    )
    docs = spark.createDataFrame(doc_rows, "doc_id long, source string")
    spark_v = {
        r.doc_id: r.allowed
        for r in robots_filter(
            docs, robots, "TrainingBot", keep_verdict=True
        ).collect()
    }
    con = _duck.connect()
    con.execute("CREATE TABLE robots (host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO robots VALUES (?, ?)", robots_rows)
    con.execute("CREATE TABLE docs (doc_id BIGINT, source VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", doc_rows)
    duck_v = dict(
        con.execute(
            f"SELECT doc_id, allowed FROM "
            f"{robots_filter_sql('docs', 'robots', 'TrainingBot')}"
        ).fetchall()
    )
    assert duck_v == spark_v
    # and the semantics themselves, hand-pinned
    assert spark_v == {
        0: False, 1: True, 2: True,     # p: 'training' rules only
        10: True, 11: True, 12: True,   # r: rule-less matched group
        20: False, 21: False, 22: True  # c: combined trainingbot groups
    }


def test_delays_and_sitemaps_duckdb_parity(spark):
    """The crawl-delay and sitemap side-channels now have SQL twins
    (consumed by the frontier gates) — pin them against the Spark
    forms on the mixed fixture."""
    import duckdb as _duck

    from spdb_spark.functions.robots import (
        robots_crawl_delays,
        robots_crawl_delays_sql,
        robots_sitemaps,
        robots_sitemaps_sql,
    )

    rows = [
        (
            "a.example",
            "Sitemap: http://a.example/sitemap.xml\n"
            "User-agent: trainingbot\nCrawl-delay: 2.5\nDisallow: /x\n\n"
            "User-agent: *\nCrawl-delay: 10\n"
            "Sitemap: http://a.example/extra.xml\n",
        ),
        ("b.example", "User-agent: *\nDisallow:\n"),
        ("c.example", "User-agent: *\nCrawl-delay: soon\n"),
        (
            "d.example",
            "User-agent: training\nCrawl-delay: 7\n\n"
            "User-agent: trainingbot-images\nCrawl-delay: 1\n",
        ),
    ]
    robots = spark.createDataFrame(rows, "host string, robots_txt string")
    con = _duck.connect()
    con.execute("CREATE TABLE rb (host VARCHAR, robots_txt VARCHAR)")
    con.executemany("INSERT INTO rb VALUES (?,?)", rows)
    for agent in ("TrainingBot", "somebot"):
        got = sorted(
            (r.host, r.delay_s)
            for r in robots_crawl_delays(robots, agent).collect()
        )
        duck = sorted(
            con.execute(
                f"SELECT * FROM {robots_crawl_delays_sql('rb', agent)}"
            ).fetchall()
        )
        assert got == duck, agent
    # the prefix group on d.example wins for trainingbot (7), the decoy
    # is ignored; '*'-less hosts drop for somebot
    got_tb = dict(
        (r.host, r.delay_s)
        for r in robots_crawl_delays(robots, "TrainingBot").collect()
    )
    assert got_tb == {"a.example": 2.5, "d.example": 7.0}
    got_maps = sorted(
        (r.host, r.sitemap) for r in robots_sitemaps(robots).collect()
    )
    duck_maps = sorted(
        con.execute(
            f"SELECT * FROM {robots_sitemaps_sql('rb')}"
        ).fetchall()
    )
    assert got_maps == duck_maps
    assert len(got_maps) == 2
