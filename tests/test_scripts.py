"""Unicode script profiling (functions/scripts.py): hand-pinned
dominance/ratio semantics across real multilingual samples, the
neutral-char exclusions, and DuckDB twin parity."""

import duckdb
from pyspark.sql import functions as F

from spdb_spark.functions.scripts import (
    SCRIPT_RANGES,
    dominant_script,
    dominant_script_sql,
    script_counts,
    script_ratio,
    script_ratio_sql,
)

ROWS = [
    (1, "hello world plain ascii 123!", "latin"),
    (2, "привет мир hello", "cyrillic"),
    (3, "日本語のテキストです", "kana"),
    (4, "مرحبا بالعالم", "arabic"),
    (5, "Ελληνικά κείμενο", "greek"),
    (6, "한국어 텍스트", "hangul"),
    (7, "नमस्ते दुनिया", "devanagari"),
    (8, "שלום עולם", "hebrew"),
    (9, "中文文本写作", "cjk"),
    (10, "héllo façade naïve", "latin"),  # Latin-1/Ext-A extensions
    (11, "1234 !!! ...", None),           # nothing counted
    (12, "", None),
]


def test_dominant_hand_pinned(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in ROWS], "id long, t string"
    )
    got = {
        r.id: r.dom
        for r in df.select(
            "id", dominant_script(F.col("t")).alias("dom")
        ).collect()
    }
    assert got == {i: want for i, _, want in ROWS}


def test_counts_exclude_neutral_chars(spark):
    df = spark.createDataFrame([("abc 123 !?. где",)], "t string")
    s = df.select(script_counts(F.col("t")).alias("s")).collect()[0].s
    assert s.latin == 3 and s.cyrillic == 3
    assert s.total == 6  # digits/punct/space are script-neutral
    assert s.other == 0


def test_ratio_quantized(spark):
    df = spark.createDataFrame([("abcде",)], "t string")
    r = df.select(
        script_ratio(F.col("t"), "latin").alias("lat"),
        script_ratio(F.col("t"), "cyrillic").alias("cyr"),
    ).collect()[0]
    assert r.lat == 0.6 and r.cyr == 0.4


def test_other_bucket_counts_unlisted_scripts(spark):
    # Armenian is outside every listed range -> other
    df = spark.createDataFrame([("աբգ ab",)], "t string")
    s = df.select(script_counts(F.col("t")).alias("s")).collect()[0].s
    assert s.other == 3 and s.latin == 2 and s.total == 5
    dom = df.select(dominant_script(F.col("t")).alias("d")).collect()[0].d
    assert dom == "other"


def test_duckdb_twin_parity(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in ROWS], "id long, t string"
    )
    cols = ["latin", "cyrillic", "cjk", "arabic", "kana"]
    got = sorted(
        tuple(r)
        for r in df.select(
            "id",
            dominant_script(F.col("t")).alias("dom"),
            *[script_ratio(F.col("t"), c).alias(c) for c in cols],
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, t VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?,?)", [(i, t) for i, t, _ in ROWS]
    )
    ratio_sql = ", ".join(script_ratio_sql("t", c) for c in cols)
    duck = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT id, {dominant_script_sql('t')}, {ratio_sql}"
            " FROM t ORDER BY id"
        ).fetchall()
    )
    assert got == duck


def test_every_range_is_re2_and_java_parseable(spark):
    """Each class must compile in BOTH engines (the \\x{...} spelling)."""
    con = duckdb.connect()
    df = spark.createDataFrame([("x",)], "t string")
    for name, rng in SCRIPT_RANGES:
        df.select(
            F.regexp_count(F.col("t"), F.lit(f"[{rng}]")).alias("n")
        ).collect()
        con.execute(f"SELECT regexp_matches('x', '[{rng}]')").fetchone()


def test_non_bmp_parity_and_other_bucket(spark):
    """Supplementary-plane characters (emoji U+1F600, CJK ext-B
    U+20000): BOTH engines match code points, not UTF-16 units — Java
    regex classes are codepoint-aware and RE2 walks UTF-8 runes — so a
    non-BMP char counts ONCE into total/other and ratios agree exactly.
    Pinned because any engine regression here silently skews every
    ratio on emoji-bearing text."""
    rows = [
        (0, "hi \U0001F600"),                 # latin + emoji
        (1, "\U00020000\U00020000 ok"),       # CJK ext-B (outside cjk range)
        (2, "\U0001F600\U0001F601\U0001F602"),  # pure emoji -> other
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    counts = {
        r.id: (r.c["total"], r.c["other"], r.c["latin"])
        for r in df.select(
            "id", script_counts(F.col("t")).alias("c")
        ).collect()
    }
    # one count per code point: 'hi ' = 2 latin, emoji = 1 other
    assert counts[0] == (3, 1, 2)
    assert counts[1] == (4, 2, 2)
    assert counts[2] == (3, 3, 0)
    cols = ["latin", "cjk"]
    got = sorted(
        tuple(r)
        for r in df.select(
            "id",
            dominant_script(F.col("t")).alias("dom"),
            *[script_ratio(F.col("t"), c).alias(c) for c in cols],
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE nb (id BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO nb VALUES (?,?)", rows)
    ratio_sql = ", ".join(script_ratio_sql("t", c) for c in cols)
    duck = sorted(
        tuple(r)
        for r in con.execute(
            f"SELECT id, {dominant_script_sql('t')}, {ratio_sql}"
            " FROM nb ORDER BY id"
        ).fetchall()
    )
    assert got == duck
