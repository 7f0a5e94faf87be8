"""C4 cleaning rules (functions/c4.py): per-rule line filtering, page
flags, DuckDB twin parity, and the zero-exchange plan shape."""

import duckdb
import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.c4 import (
    c4_clean_lines,
    c4_clean_lines_sql,
    c4_filter,
    c4_filter_sql,
    c4_page_flags,
    c4_page_flags_sql,
)

KEPT_A = "The quick data pipeline processes every shard tonight."
KEPT_B = "Is the second batch of records correct?"
KEPT_C = 'He said "the merge is finally done."'
KEPT_D = "Every replica caught up before the deadline!"
KEPT_E = 'They shouted "ready for the rollout now"'  # bare end quote: terminal
KEPT_F = "All ingest queues drained cleanly overnight."
NO_PUNCT = "raw fragment without any terminal mark"
ELLIPSIS = "the page kept loading more results..."  # terminal '.' but dropped
APOS = "He whispered 'the cache is warm now.'"  # straight ' not in _END_MARKS
JS = "Please enable javascript to view this page."
POLICY = "We updated our privacy policy for you today."
SHORT = "Short line here."
LOREM = "lorem ipsum dolor sit amet filler text here."
BRACE = "var f = function() { return 1; }"


def _page(*lines):
    return "\n".join(lines)


def test_line_rules(spark):
    page = _page(
        KEPT_A, NO_PUNCT, JS, POLICY, KEPT_B, SHORT, KEPT_C,
        KEPT_D, KEPT_E, KEPT_F, ELLIPSIS, APOS,
    )
    df = spark.range(1).select(
        c4_clean_lines(F.lit(page)).alias("t"),
        c4_filter(F.lit(page)).alias("keep"),
        c4_page_flags(F.lit(page)).alias("s"),
    )
    r = df.collect()[0]
    assert r["t"].split("\n") == [KEPT_A, KEPT_B, KEPT_C, KEPT_D, KEPT_E, KEPT_F]
    assert r["s"]["kept_lines"] == 6
    # one terminal mark per kept line except the bare-quote line (0)
    assert r["s"]["n_sentences"] == 5
    assert r["keep"] is True


def test_page_rules(spark):
    ok = _page(KEPT_A, KEPT_B, KEPT_C, KEPT_D, KEPT_F)  # 5 sentences
    rows = {
        "ok": ok,
        "lorem": _page(KEPT_A, KEPT_B, KEPT_C, KEPT_D, KEPT_F, LOREM),
        "brace": _page(KEPT_A, KEPT_B, KEPT_C, KEPT_D, KEPT_F, BRACE),
        "thin": _page(KEPT_A, KEPT_B, KEPT_C, KEPT_D),  # only 4 sentences
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in rows.items()], "name string, text string"
    ).select("name", c4_filter(F.col("text")).alias("keep"))
    got = {r["name"]: r["keep"] for r in df.collect()}
    assert got == {"ok": True, "lorem": False, "brace": False, "thin": False}


def test_badwords_pluggable(spark):
    page = _page(KEPT_A, KEPT_B, KEPT_C, KEPT_D, KEPT_F,
                 "The gnarly widget arrived late today.")
    base = spark.range(1).select(
        c4_filter(F.lit(page)).alias("keep"),
        c4_clean_lines(F.lit(page)).alias("t"),
    ).collect()[0]
    assert base["keep"] is True and "gnarly" in base["t"]
    bad = spark.range(1).select(
        c4_filter(F.lit(page), badwords=("gnarly",)).alias("keep"),
        c4_clean_lines(F.lit(page), badwords=("gnarly",)).alias("t"),
    ).collect()[0]
    # line dropped AND page rejected
    assert bad["keep"] is False and "gnarly" not in bad["t"]


@pytest.mark.parametrize("badwords", [(), ("gnarly",)])
def test_duckdb_twin_parity(spark, badwords):
    pages = [
        _page(KEPT_A, NO_PUNCT, JS, POLICY, KEPT_B, SHORT, KEPT_C),
        _page(KEPT_A, KEPT_B, KEPT_C, KEPT_D, KEPT_F, LOREM),
        _page(KEPT_A, KEPT_B, KEPT_C, KEPT_D, KEPT_F, BRACE),
        _page(KEPT_A, KEPT_B),
        _page(KEPT_A, KEPT_B, KEPT_C, KEPT_D, KEPT_F,
              "The gnarly widget arrived late today."),
        _page(KEPT_E, ELLIPSIS, APOS, KEPT_A, KEPT_B, KEPT_C, KEPT_D, KEPT_F),
        "",
        "   ",
        "no newline and no punctuation at all",
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pages)], "i long, text string"
    ).select(
        "i",
        c4_clean_lines(F.col("text"), badwords).alias("clean"),
        c4_page_flags(F.col("text"), badwords).alias("s"),
        c4_filter(F.col("text"), badwords).alias("keep"),
    ).select("i", "clean", "s.*", "keep")
    got = {r["i"]: r.asDict() for r in df.collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE pages(i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", list(enumerate(pages)))
    sql = (
        f"WITH t AS (SELECT i, {c4_clean_lines_sql('text', badwords)} AS clean,"
        f" {c4_page_flags_sql('text', badwords)} AS s,"
        f" {c4_filter_sql('text', badwords)} AS keep FROM pages) "
        "SELECT i, clean, s.kept_lines AS kept_lines, s.kept_words AS kept_words,"
        " s.n_sentences AS n_sentences, s.has_lorem AS has_lorem,"
        " s.has_brace AS has_brace, s.has_badword AS has_badword, keep FROM t"
    )
    want = con.execute(sql).fetchdf().set_index("i").to_dict("index")
    assert set(got) == set(want)
    for i in got:
        for k in ("clean", "kept_lines", "kept_words", "n_sentences",
                  "has_lorem", "has_brace", "has_badword", "keep"):
            assert got[i][k] == want[i][k], (i, k, got[i][k], want[i][k])


def test_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "a.\nb")], "i long, text string").select(
        c4_clean_lines(F.col("text")).alias("clean"),
        c4_filter(F.col("text")).alias("keep"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
