"""HTML main-content extraction tests: hand-computed block
classification, entity/invisible-content handling, DuckDB oracle parity
(the r7 gate contract), and the shuffle-free plan gate."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.html import (
    html_block_stats,
    html_blocks,
    html_main_text,
    main_text_sql,
)

_PAGE = """<html><head><title>Site — Page</title>
<style>body { color: red }</style>
<script type="text/javascript">var x = "<p>not content</p>";</script>
</head><body>
<nav><ul>
<li><a href="/">Home</a></li><li><a href="/about">About</a></li>
<li><a href="/contact">Contact</a></li><li><a href="/blog">Blog</a></li>
<li><a href="/jobs">Jobs</a></li><li><a href="/press">Press</a></li>
</ul></nav>
<header><h1>The quarterly infrastructure report</h1></header>
<article>
<p>Spark clusters grew by forty percent this quarter, driven by the
ingestion pipeline moving to structured streaming and the new parquet
layout landing ahead of schedule.</p>
<p>Costs fell &amp; latency improved: the p99 dropped from nine seconds
to under two, even as corpus size doubled. See the
<a href="/report">full report</a> for per-team breakdowns and the
methodology appendix covering sampling windows.</p>
<!-- TODO: drop the old chart -->
</article>
<footer><p><a href="/privacy">Privacy</a> · <a href="/terms">Terms</a> ·
<a href="/imprint">Imprint</a></p></footer>
</body></html>"""


def test_main_text_keeps_prose_drops_chrome(spark):
    df = spark.createDataFrame([(1, _PAGE)], "id long, html string")
    out = df.select(html_main_text(F.col("html")).alias("t")).first()["t"]
    assert "Spark clusters grew by forty percent" in out
    assert "Costs fell & latency improved" in out  # entity unescaped
    assert "full report" in out  # moderate link density survives
    # chrome, invisible content, and short headline blocks are gone
    for gone in ("Home", "About", "Privacy", "Terms", "color: red",
                 "not content", "TODO", "Site — Page"):
        assert gone not in out, gone
    # title/header dropped only for being short, not mis-parsed
    assert "quarterly infrastructure report" not in out


def test_block_stats_hand_computed(spark):
    html = '<p>one two three</p><div><a href="x">four five six seven</a> eight</div>'
    df = spark.createDataFrame([(1, html)], "id long, html string")
    rows = html_blocks(df, "id", "html").collect()
    assert [r["text"] for r in rows] == ["one two three", "four five six seven eight"]
    a, b = rows
    assert (a["n_words"], a["link_chars"]) == (3, 0)
    # block b: 25 text chars, 19 anchor chars -> link-dense
    assert (b["n_chars"], b["n_words"], b["link_chars"]) == (25, 5, 19)
    assert not a["is_main"]  # too short
    assert not b["is_main"]  # link-dense
    # pos is in document order
    assert a["pos"] < b["pos"]


def test_entity_unescape_order(spark):
    # '&amp;lt;' is the literal text '&lt;' — must NOT double-unescape
    html = "<p>a &amp;lt; b and c &lt; d plus more words here</p>"
    df = spark.createDataFrame([(1, html)], "id long, html string")
    out = df.select(html_main_text(F.col("html")).alias("t")).first()["t"]
    assert "a &lt; b" in out and "c < d" in out


@pytest.mark.parametrize("min_words", [1, 5])
def test_duckdb_oracle_parity(spark, min_words):
    cases = [
        _PAGE,
        "",
        "no tags at all just a plain sentence with several words",
        "<p></p><p>only one</p>",
        "<P CLASS='x'>upper case tags with five words</P>",
        "<div>text <a href='#'>link text dominating this</a></div>",
        "<script>junk()</script><p>after the script five words</p>",
        "<pre>code block with   odd   spacing kept collapsed</pre>",
        "<p>&quot;quoted&quot; &amp; &#39;apos&#39; entities here now</p>",
        "<ul><li>alpha beta gamma delta epsilon zeta</li></ul>",
        "<br>broken<br/>by breaks into tiny bits<hr>",
        "self closing <div/> splits here as well ok",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "id long, html string"
    )
    got = {
        r["id"]: r["t"]
        for r in df.select(
            "id", html_main_text(F.col("html"), min_words=min_words).alias("t")
        ).collect()
    }
    con = duckdb.connect()
    sql = (
        f"SELECT {main_text_sql('html', min_words=min_words)}"
        " FROM (SELECT ? AS html)"
    )
    for i, c in enumerate(cases):
        (want,) = con.execute(sql, [c]).fetchone()
        assert got[i] == want, (i, got[i], want)


def test_plan_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, _PAGE)], "id long, html string")
    plan = (
        df.select(html_main_text(F.col("html")).alias("t"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    blocks_plan = (
        html_blocks(df, "id", "html")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in blocks_plan  # explode is narrow


def test_warc_main_content_option(spark, tmp_path):
    from spdb_spark.sources.warc import (
        ingest_warc,
        warc_encode,
        warc_responses_to_docs,
    )

    page = ("<html><body><nav><a href='/'>Home</a> <a href='/a'>About</a> "
            "<a href='/c'>Contact</a></nav><p>Throughput doubled this "
            "quarter while unit costs stayed flat across regions.</p>"
            "<footer><a href='/p'>Privacy</a></footer></body></html>")
    resp = ("HTTP/1.1 200 OK\r\n\r\n" + page).encode()
    recs = [{"warc_type": "response", "target_uri": "http://x.test/1",
             "payload": resp}]
    (tmp_path / "s.warc.gz").write_bytes(warc_encode(recs))
    warc = ingest_warc(spark, str(tmp_path))
    flat = warc_responses_to_docs(warc).first()["text"]
    main = warc_responses_to_docs(warc, main_content=True).first()["text"]
    assert "Home" in flat and "Privacy" in flat
    assert "Throughput doubled" in main
    assert "Home" not in main and "Privacy" not in main


def test_crawl_to_corpus_composition(spark, tmp_path):
    """WARC -> extracted+normalized+filtered+deduped docs in one call."""
    from spdb_spark.sources.crawl import crawl_to_corpus
    from spdb_spark.sources.warc import ingest_warc, warc_encode

    prose = ("The quarterly migration to the new storage layout is complete "
             "and every pipeline that used to write to the old bucket now "
             "streams records through the unified ingestion service which "
             "we have verified to be stable with costs down by a third and "
             "fewer pages for the on-call rotation than any month this year.")
    page = ("<html><body><nav><a href='/'>Home</a> <a href='/a'>About</a> "
            f"<a href='/c'>Contact</a></nav><p>{prose}</p>"
            "<footer><a href='/p'>Privacy</a></footer></body></html>")
    resp = ("HTTP/1.1 200 OK\r\n\r\n" + page).encode()
    junk = b"HTTP/1.1 200 OK\r\n\r\n<p># # # # # # #</p>"
    recs = (
        # same page under two URL spellings: collapses via normalization
        [{"warc_type": "response", "target_uri": u, "payload": resp}
         for u in ("http://X.org/a?utm_source=s", "HTTP://x.ORG:80/a")]
        # same content at a different URL: exact-text dedup catches it
        + [{"warc_type": "response", "target_uri": "http://y.org/b",
            "payload": resp}]
        + [{"warc_type": "response", "target_uri": "http://x.org/junk",
            "payload": junk}]
    )
    (tmp_path / "c.warc.gz").write_bytes(warc_encode(recs))
    warc = ingest_warc(spark, str(tmp_path))
    docs = crawl_to_corpus(warc).collect()
    assert len(docs) == 1  # one survivor: normalized+deduped+quality-passed
    assert "quarterly migration" in docs[0]["text"]
    assert "Home" not in docs[0]["text"]  # chrome stripped
    # with quality off, the junk page survives
    from spdb_spark.sources.crawl import crawl_to_corpus as c2c
    assert len(c2c(warc, quality=False).collect()) == 2


def test_crawl_to_corpus_with_dsir_selection(spark, tmp_path):
    """The optional selection stage: curate, then keep a deterministic
    DSIR sample of k docs biased toward the target distribution."""
    from spdb_spark.sources.crawl import crawl_to_corpus
    from spdb_spark.sources.warc import ingest_warc, warc_encode

    def page(body: str) -> bytes:
        html = f"<html><body><p>{body}</p></body></html>"
        return ("HTTP/1.1 200 OK\r\n\r\n" + html).encode()

    finance = ("the market closed higher today with bank shares leading "
               "gains while analysts said rates and earnings will drive "
               "the next quarter as investors weigh inflation data and "
               "the outlook for credit across regional lenders this year")
    cooking = ("simmer the onions in butter until golden then fold in the "
               "rice and stock a ladle at a time stirring gently while the "
               "grains soften and season with cheese and pepper before "
               "serving the risotto warm with a crisp salad on the side")
    recs = []
    for i in range(6):
        recs.append({"warc_type": "response",
                     "target_uri": f"http://f{i}.org/m",
                     "payload": page(f"{finance} item {i}")})
        recs.append({"warc_type": "response",
                     "target_uri": f"http://c{i}.org/m",
                     "payload": page(f"{cooking} item {i}")})
    (tmp_path / "d.warc.gz").write_bytes(warc_encode(recs))
    warc = ingest_warc(spark, str(tmp_path))

    target = spark.createDataFrame(
        [(1000, finance + " trading desks")], "doc_id long, text string"
    )
    # quality off: the fixture pages are shorter than the Gopher
    # word-count floor, and selection is the stage under test
    picked = crawl_to_corpus(
        warc, quality=False, near_dedup=False,
        select_target=target, select_k=4,
    )
    rows = picked.collect()
    again = crawl_to_corpus(
        warc, quality=False, near_dedup=False,
        select_target=target, select_k=4,
    ).collect()
    assert len(rows) == 4
    assert sorted(r["doc_id"] for r in rows) == sorted(
        r["doc_id"] for r in again
    )  # deterministic
    n_finance = sum("market" in r["text"] for r in rows)
    assert n_finance >= 3  # selection skews hard toward the target


def test_crawl_exact_dedup_keeps_min_doc_id(spark, tmp_path):
    """Exact dedup must keep the MINIMUM doc_id per text group (the
    exact_dup_groups/SQL_DEDUP_EXACT canonical-id policy), not whichever
    row a scan met first — survivors are a pure function of the corpus."""
    from spdb_spark.sources.crawl import crawl_to_corpus
    from spdb_spark.sources.warc import ingest_warc, warc_encode

    prose = ("The quarterly migration to the new storage layout is complete "
             "and every pipeline that used to write to the old bucket now "
             "streams records through the unified ingestion service which "
             "we have verified to be stable with costs down by a third and "
             "fewer pages for the on-call rotation than any month this year.")
    page = f"<html><body><p>{prose}</p></body></html>"
    resp = ("HTTP/1.1 200 OK\r\n\r\n" + page).encode()
    recs = [
        {"warc_type": "response", "target_uri": f"http://h{i}.org/p",
         "payload": resp}
        for i in range(5)
    ]
    (tmp_path / "e.warc.gz").write_bytes(warc_encode(recs))
    warc = ingest_warc(spark, str(tmp_path))

    from spdb_spark.sources.warc import warc_responses_to_docs

    all_ids = sorted(
        r["doc_id"] for r in warc_responses_to_docs(warc).collect()
    )
    assert len(all_ids) == 5
    survivors = crawl_to_corpus(warc, near_dedup=False).collect()
    assert len(survivors) == 1
    assert survivors[0]["doc_id"] == all_ids[0]
