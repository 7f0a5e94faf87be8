"""Gopher quality-rule tests: hand-computed signals, published-threshold
behavior, and DuckDB oracle parity."""

import duckdb
from pyspark.sql import functions as F

from spdb_spark.functions.quality import (
    gopher_filter,
    gopher_filter_sql,
    gopher_flags_sql,
    gopher_quality_flags,
)

GOOD = (
    "The quarterly migration to the new storage layout is complete and "
    "every pipeline that used to write to the old bucket now streams "
    "records through the unified ingestion service. We have verified "
    "that throughput is stable, costs fell by a third, and the on-call "
    "rotation reports fewer pages than in any month of the past year."
)

CASES = [
    GOOD,
    "short doc",
    "# # # # " * 30,                       # symbol-heavy
    "\n".join("- item %d words here" % i for i in range(20)),  # bullets
    "\n".join("trailing thought..." for _ in range(10)),       # ellipses
    "\n".join(["the same line with many words appears here"] * 8),  # dup lines
    ("zz9 " * 80) + "the of and",          # non-alpha words
    "",                                      # empty: 1 pseudo-token quirk
    GOOD + "\nthe be to of and that have with",
]


def test_hand_computed_signals(spark):
    doc = "The cat sat\n- one\n- two\nthe end...\nthe end..."
    df = spark.createDataFrame([(doc,)], "t string")
    s = df.select(gopher_quality_flags(F.col("t")).alias("s")).first()["s"]
    assert s["word_count"] == 11
    # lines: [The cat sat, - one, - two, the end..., the end...]
    assert abs(s["bullet_frac"] - 2 / 5) < 1e-12
    assert abs(s["ellipsis_frac"] - 2 / 5) < 1e-12
    assert abs(s["dup_line_frac"] - 1 / 5) < 1e-12  # one duplicate line
    assert s["stop_hits"] == 1  # only 'the' among the common-word list


def test_stop_hits_counts_distinct_words(spark):
    df = spark.createDataFrame([("the be to xyz",), ("the the the",)], "t string")
    rows = df.select(
        gopher_quality_flags(F.col("t"))["stop_hits"].alias("h")
    ).collect()
    assert rows[0]["h"] == 3  # the, be, to
    assert rows[1]["h"] == 1  # 'the' counted once


def test_filter_published_thresholds(spark):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(CASES)], "id long, t string")
    got = {
        r["id"]: r["ok"]
        for r in df.select("id", gopher_filter(F.col("t")).alias("ok")).collect()
    }
    assert got[0] is True         # real prose passes
    assert got[1] is False        # too short
    assert got[2] is False        # symbol ratio
    assert got[5] is False        # duplicate lines
    assert got[6] is False        # alpha fraction
    assert got[7] is False        # empty


def test_duckdb_oracle_parity(spark):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(CASES)], "id long, t string"
    )
    got = {
        r["id"]: (dict(r["s"].asDict()), r["ok"])
        for r in df.select(
            "id",
            gopher_quality_flags(F.col("t")).alias("s"),
            gopher_filter(F.col("t")).alias("ok"),
        ).collect()
    }
    con = duckdb.connect()
    sql = (
        f"SELECT {gopher_flags_sql('t')} AS s, {gopher_filter_sql('t')} AS ok"
        " FROM (SELECT ? AS t)"
    )
    for i, c in enumerate(CASES):
        s, ok = con.execute(sql, [c]).fetchone()
        want_s, want_ok = got[i]
        assert ok == want_ok, (i, ok, want_ok)
        for k, v in want_s.items():
            if isinstance(v, float):
                assert abs(s[k] - v) < 1e-12, (i, k, s[k], v)
            else:
                assert s[k] == v, (i, k, s[k], v)
