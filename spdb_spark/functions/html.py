"""Boilerplate-aware HTML main-content extraction, shuffle-free.

The jusText/boilerpipe observation (Pomikalek 2011, public): navigation,
footers, and chrome live in link-dense short blocks; article prose lives
in long low-link-density blocks. This module classifies block-level
segments with two deterministic integer-ish signals — word count and
link density — and reassembles the surviving blocks in document order.

Spark-first shape: the WHOLE operator is a chain of Column expressions
(split -> transform -> filter -> concat_ws over higher-order array
functions), so extraction is a projection inside the scan stage — zero
exchanges, no UDF, no Python in the hot path. At 100 TB the cost is one
pass over the payload column at scan parallelism.

Engine-parity constraints (the DuckDB oracle runs RE2): no
backreferences (script/style each get their own pattern), no lookahead,
non-greedy + (?is) flags only — every regex here is RE2-compatible, and
`main_text_sql` emits the equivalent DuckDB SQL so gate oracles can
replay the extraction exactly.

No reference-repo counterpart (jhuapl-boss/spdb is voxel-only); this is
part of the LLM training-data pipeline surface (SURVEY.md north-star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block-level boundaries: opening OR closing forms of the HTML5
# flow-content containers; <br>/<hr> also break blocks.
_BLOCK_TAGS = (
    "p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th"
    "|blockquote|pre|section|article|main|header|footer|nav|aside|form"
    "|fieldset|figure|figcaption|br|hr|title"
)
_BLOCK_SPLIT = rf"(?i)</?(?:{_BLOCK_TAGS})(?:\s[^>]*)?/?>"

_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last: '&amp;lt;' means literal '&lt;', not '<'
)


def strip_invisible(c: Column) -> Column:
    """Drop comments and script/style subtrees (separate patterns per tag:
    the oracle's RE2 has no backreferences)."""
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?is)<script(?:\s[^>]*)?>.*?</script\s*>", " ")
    c = F.regexp_replace(c, r"(?is)<style(?:\s[^>]*)?>.*?</style\s*>", " ")
    return c


def _clean_text(c: Column) -> Column:
    """Strip remaining (inline) tags, unescape the common entities,
    collapse whitespace."""
    t = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def _anchor_text(c: Column) -> Column:
    """Concatenated text inside <a> elements of one block (anchors that
    span block boundaries contribute to neither side — documented
    approximation, same in the oracle)."""
    return _clean_text(
        F.concat_ws(
            " ",
            F.regexp_extract_all(
                c, F.lit(r"(?is)<a(?:\s[^>]*)?>(.*?)</a\s*>"), F.lit(1)
            ),
        )
    )


def html_block_stats(html: Column) -> Column:
    """-> array<struct<pos,text,n_chars,n_words,link_chars>> of block-level
    segments with their classification signals, in document order. Pure
    projection (split + transform); empty blocks are dropped."""
    blocks = F.split(strip_invisible(html), _BLOCK_SPLIT)
    # Two nested transforms so the _clean_text regex chain (tag strip +
    # 6 entity replaces + whitespace collapse) runs ONCE per block: the
    # single-transform form inlined it into the lambda three times
    # (text, n_chars, n_words) and lambdas re-evaluate inlined
    # expressions per reference. Same structs, same order.
    base = F.transform(
        blocks,
        lambda b, i: F.struct(
            i.alias("pos"),
            _clean_text(b).alias("text"),
            F.length(_anchor_text(b)).alias("link_chars"),
        ),
    )
    structs = F.transform(
        base,
        lambda s: F.struct(
            s["pos"].alias("pos"),
            s["text"].alias("text"),
            F.length(s["text"]).alias("n_chars"),
            F.size(F.split(s["text"], " ")).alias("n_words"),
            s["link_chars"].alias("link_chars"),
        ),
    )
    return F.filter(structs, lambda s: s["n_chars"] > 0)


def html_main_text(
    html: Column,
    min_words: int = 5,
    max_link_density: float = 1.0 / 3.0,
) -> Column:
    """Main-content text: blocks with >= min_words words and link density
    <= max_link_density, joined by a single space in document order.
    Deterministic — both signals are integer comparisons (the density
    test is link_chars <= n_chars * max_link_density, identical IEEE
    arithmetic in Spark and DuckDB)."""
    good = F.filter(
        html_block_stats(html),
        lambda s: (s["n_words"] >= F.lit(min_words))
        & (s["link_chars"] <= s["n_chars"] * F.lit(float(max_link_density))),
    )
    return F.concat_ws(" ", F.transform(good, lambda s: s["text"]))


def html_blocks(df: DataFrame, id_col: str, html_col: str) -> DataFrame:
    """Exploded per-block table (id, pos, text, n_chars, n_words,
    link_chars, is_main) for corpus-level boilerplate analysis. Explode
    is narrow — still no shuffle."""
    s = F.explode(html_block_stats(F.col(html_col))).alias("b")
    return df.select(F.col(id_col), s).select(
        id_col,
        F.col("b.pos").alias("pos"),
        F.col("b.text").alias("text"),
        F.col("b.n_chars").alias("n_chars"),
        F.col("b.n_words").alias("n_words"),
        F.col("b.link_chars").alias("link_chars"),
        (
            (F.col("b.n_words") >= 5)
            & (F.col("b.link_chars") <= F.col("b.n_chars") * F.lit(1.0 / 3.0))
        ).alias("is_main"),
    )


# One pattern per quoting style — they are mutually exclusive on the
# first character after `=` so concatenating the three match lists
# yields each href exactly once. `href` must follow WHITESPACE (not a
# word boundary: `-` borders words, so `\b` would match `data-href=`).
_HREF_PRE = r"(?is)<a(?:\s[^>]*?)?\shref\s*=\s*"
_HREF_DQ = _HREF_PRE + r'"([^"]*)"'
_HREF_SQ = _HREF_PRE + r"'([^']*)'"
_HREF_UQ = _HREF_PRE + r"""([^\s"'>][^\s>]*)"""


def html_href_targets(html: Column) -> Column:
    """-> array<string> of raw href attribute values from the document's
    `<a>` tags (double-quoted, then single-quoted, then unquoted
    spellings), entity-unescaped (`&amp;` is the legal spelling of `&`
    inside attribute values). Comments and script/style subtrees are
    stripped first so commented-out markup contributes no links. Pure
    projection — zero exchanges, no UDF; at 100 TB link extraction
    rides the same scan pass as main-content extraction."""
    c = strip_invisible(html)
    raw = F.concat(
        F.regexp_extract_all(c, F.lit(_HREF_DQ), F.lit(1)),
        F.regexp_extract_all(c, F.lit(_HREF_SQ), F.lit(1)),
        F.regexp_extract_all(c, F.lit(_HREF_UQ), F.lit(1)),
    )

    def unescape(v: Column) -> Column:
        for ent, rep in _ENTITIES:
            v = F.replace(v, F.lit(ent), F.lit(rep))
        return F.trim(v)

    return F.filter(F.transform(raw, unescape), lambda v: v != "")


def href_targets_sql(html_expr: str) -> str:
    """DuckDB SQL computing exactly html_href_targets(html_expr) as a
    LIST(VARCHAR). Spark's patterns capture the href in group 1 (the
    attribute prefix is non-capturing); RE2 under DuckDB has no
    non-capturing-group extract_all shorthand here, so the SQL spelling
    wraps the prefix in a group and the href is group 2."""
    c = _sql_strip_invisible(html_expr)
    pre = "(?is)<a(\\s[^>]*?)?\\shref\\s*=\\s*"
    dq = pre + '"([^"]*)"'
    sq = pre + "''([^'']*)''"
    uq = pre + "([^\\s\"''>][^\\s>]*)"
    parts = " || ".join(
        f"regexp_extract_all({c}, '{p}', 2)" for p in (dq, sq, uq)
    )
    v = "v"
    for ent, rep in _ENTITIES:
        ent_sql = ent.replace("'", "''")
        rep_sql = rep.replace("'", "''")
        v = f"replace({v}, '{ent_sql}', '{rep_sql}')"
    return (
        f"list_filter(list_transform({parts}, v -> trim({v})),"
        f" v -> v <> '')"
    )


# ---------------------------------------------------------------------------
# DuckDB oracle builders: the same extraction as ANSI-ish SQL over RE2.
# DuckDB regexp_replace is single-match unless the 'g' option is passed;
# list_transform/list_filter mirror the higher-order functions.
# ---------------------------------------------------------------------------

def _sql_clean(expr: str) -> str:
    s = f"regexp_replace({expr}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, rep in _ENTITIES:
        ent_sql = ent.replace("'", "''")
        rep_sql = rep.replace("'", "''")
        s = f"replace({s}, '{ent_sql}', '{rep_sql}')"
    return f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"


def _sql_strip_invisible(expr: str) -> str:
    s = f"regexp_replace({expr}, '(?s)<!--.*?-->', ' ', 'g')"
    s = f"regexp_replace({s}, '(?is)<script(\\s[^>]*)?>.*?</script\\s*>', ' ', 'g')"
    return f"regexp_replace({s}, '(?is)<style(\\s[^>]*)?>.*?</style\\s*>', ' ', 'g')"


def _sql_anchor(expr: str) -> str:
    arr = f"regexp_extract_all({expr}, '(?is)<a(\\s[^>]*)?>(.*?)</a\\s*>', 2)"
    # coalesce: DuckDB's string_agg of an empty list is NULL where Spark's
    # concat_ws is '' — without it anchor-free blocks would vanish from
    # the oracle's filter (NULL comparison) but survive in Spark.
    return _sql_clean(f"coalesce(list_aggregate({arr}, 'string_agg', ' '), '')")


def main_text_sql(html_expr: str, min_words: int = 5) -> str:
    """DuckDB SQL computing exactly html_main_text(html_expr) with the
    default 1/3 link-density threshold. Spark's regexp_extract_all uses
    group 1 for the anchor body; the SQL form wraps the attribute part in
    a group too, so the anchor body is group 2 there."""
    split = (
        f"regexp_split_to_array({_sql_strip_invisible(html_expr)},"
        f" '(?i)</?({_BLOCK_TAGS})(\\s[^>]*)?/?>')"
    )
    block = _sql_clean("b")
    anchor = _sql_anchor("b")
    good = (
        f"list_filter(list_transform({split}, b -> struct_pack("
        f"txt := {block}, link_chars := length({anchor}))),"
        f" s -> length(s.txt) > 0 AND length(string_split(s.txt, ' ')) >= {min_words}"
        f" AND s.link_chars <= length(s.txt) * (1.0/3.0))"
    )
    return (
        f"coalesce(list_aggregate(list_transform({good}, s -> s.txt),"
        f" 'string_agg', ' '), '')"
    )
