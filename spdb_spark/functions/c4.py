"""C4-style cleaning rules (Raffel et al. 2020, public), as shuffle-free
Column expressions.

The published line- and page-level rule set behind the C4 corpus:

- keep only lines ending in a terminal punctuation mark (period,
  exclamation mark, question mark, or end quotation mark — the
  published implementation's _END_MARKS set, where a bare closing
  quote IS terminal), except lines ending in an ellipsis "...";
- keep only lines with at least 5 words;
- drop any line containing the word "javascript";
- drop boilerplate policy lines ("terms of use", "privacy policy",
  "cookie policy", "uses cookies", "use of cookies", "use cookies");
- drop pages with fewer than 5 sentences after line cleaning (the
  released implementation's _MIN_NUM_SENTENCES = 5; the paper text
  says 3 — we follow the code, which is what produced the corpus);
- drop pages containing "lorem ipsum" or a curly brace "{";
- drop pages containing a blocklisted word (the published rule uses an
  external list; the list here is a caller-supplied parameter so
  deployments plug their own — the default empty tuple keeps the rule
  inert but wired).

Every signal is a higher-order array / regexp Column expression — a pure
projection inside the scan stage, zero exchanges, no Python — and every
regex is RE2-compatible, with the `*_sql` twins emitting the equivalent
DuckDB expressions for gate oracles. Complements functions/quality.py
(Gopher hard rules) and functions/text.py (soft quality score): C4 is
the line-oriented cleaner of the three.

Sentence counting is the C4 proxy: occurrences of . ! ? in the cleaned
text (each kept line contributes at least its terminal mark), computed
with translate() so both engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from spdb_spark.functions.text import tokens

MIN_LINE_WORDS = 5
# The released C4 code uses 5 (_MIN_NUM_SENTENCES); the paper prose says
# 3. The corpus was built with 5, so 5 is the default; callers needing
# the paper variant pass min_sentences=3 to c4_filter / c4_filter_sql.
MIN_SENTENCES = 5

# End-of-line terminal mark: the published _END_MARKS set (. ! ? ") plus
# the curly close-quote as its Unicode equivalent. A bare closing quote
# is terminal by itself; an ellipsis is excluded separately (the
# published rule drops lines ending in "..."). RE2-safe.
_TERMINAL_RE = '[.!?"”]$'

POLICY_PHRASES = (
    "terms of use",
    "privacy policy",
    "cookie policy",
    "uses cookies",
    "use of cookies",
    "use cookies",
)


def _clean_line_pred(line: Column, badwords: tuple[str, ...]) -> Column:
    low = F.lower(line)
    keep = (
        (F.length(line) > 0)
        & line.rlike(_TERMINAL_RE)
        & ~line.endswith("...")
        & (F.size(tokens(line)) >= MIN_LINE_WORDS)
        & ~low.contains("javascript")
    )
    for p in POLICY_PHRASES:
        keep = keep & ~low.contains(p)
    for w in badwords:
        keep = keep & ~low.contains(w.lower())
    return keep


def c4_clean_lines(c: Column, badwords: tuple[str, ...] = ()) -> Column:
    """The C4 line filter: text -> text with only the surviving lines
    (joined back with newlines; '' if nothing survives)."""
    kept = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: _clean_line_pred(l, badwords),
    )
    return F.array_join(kept, "\n")


def _sentence_count(c: Column) -> Column:
    return (
        F.length(c) - F.length(F.translate(c, ".!?", ""))
    ).cast("long")


def c4_page_flags(c: Column, badwords: tuple[str, ...] = ()) -> Column:
    """struct of the raw page-level signals over the ORIGINAL text plus
    the post-line-filter counts: kept_lines, kept_words, n_sentences
    (of the cleaned text), has_lorem, has_brace, has_badword.

    The kept-line array (the expensive per-line predicate chain) is
    bound ONCE (text._bind_once): three fields consume it (count, word
    sum, and the cleaned-text sentence count via array_join), and each
    reference would otherwise re-run the whole line filter per row.
    One evaluation of this struct therefore runs the chain once, not
    three times; extract the struct behind its own projection (as the
    gate does) rather than calling this per field."""
    from spdb_spark.functions.text import _bind_once

    kept_expr = F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: _clean_line_pred(l, badwords),
    )
    low = F.lower(c)
    has_bad = F.lit(False)
    for w in badwords:
        has_bad = has_bad | low.contains(w.lower())

    def body(kept: Column) -> Column:
        return F.struct(
            F.size(kept).cast("long").alias("kept_lines"),
            F.aggregate(
                kept,
                F.lit(0).cast("long"),
                lambda acc, l: acc + F.size(tokens(l)),
            ).alias("kept_words"),
            _sentence_count(F.array_join(kept, "\n")).alias("n_sentences"),
            low.contains("lorem ipsum").alias("has_lorem"),
            c.contains("{").alias("has_brace"),
            has_bad.alias("has_badword"),
        )

    return _bind_once(kept_expr, body)


def c4_filter(
    c: Column,
    badwords: tuple[str, ...] = (),
    min_sentences: int = MIN_SENTENCES,
) -> Column:
    """True iff the page passes the C4 page rules after line cleaning.

    Computed directly rather than extracting c4_page_flags fields: the
    flags struct is built inside a higher-order binding, so each field
    extraction would re-run its whole body; the filter needs the
    line-filter chain exactly once (the sentence count) and three cheap
    contains() signals."""
    low = F.lower(c)
    has_bad = F.lit(False)
    for w in badwords:
        has_bad = has_bad | low.contains(w.lower())
    return (
        (_sentence_count(c4_clean_lines(c, badwords)) >= min_sentences)
        & ~low.contains("lorem ipsum")
        & ~c.contains("{")
        & ~has_bad
    )


# ---------------------------------------------------------------------------
# DuckDB twins (RE2; same tokens() empty-string quirk as functions/text.py).
# ---------------------------------------------------------------------------

# DuckDB string literal for the terminal-punctuation regex.
_TERMINAL_SQL = "'[.!?\"”]$'"


def _clean_pred_sql(line: str, badwords: tuple[str, ...]) -> str:
    low = f"lower({line})"
    toks = f"string_split_regex(lower(trim({line})), '\\s+')"
    parts = [
        f"length({line}) > 0",
        f"regexp_matches({line}, {_TERMINAL_SQL})",
        f"NOT ends_with({line}, '...')",
        f"length({toks}) >= {MIN_LINE_WORDS}",
        f"NOT contains({low}, 'javascript')",
    ]
    parts += [f"NOT contains({low}, '{p}')" for p in POLICY_PHRASES]
    parts += [f"NOT contains({low}, '{w.lower()}')" for w in badwords]
    return "(" + " AND ".join(parts) + ")"


def _kept_lines_sql(expr: str, badwords: tuple[str, ...]) -> str:
    return (
        f"list_filter(list_transform(string_split({expr}, chr(10)),"
        f" l -> trim(l)), l -> {_clean_pred_sql('l', badwords)})"
    )


def c4_clean_lines_sql(expr: str, badwords: tuple[str, ...] = ()) -> str:
    # coalesce: DuckDB's list_aggregate-style joins yield NULL on empty
    # lists where Spark's array_join yields ''.
    return (
        f"coalesce(array_to_string({_kept_lines_sql(expr, badwords)},"
        f" chr(10)), '')"
    )


def c4_page_flags_sql(expr: str, badwords: tuple[str, ...] = ()) -> str:
    kept = _kept_lines_sql(expr, badwords)
    cleaned = c4_clean_lines_sql(expr, badwords)
    low = f"lower({expr})"
    has_bad = (
        "(" + " OR ".join(f"contains({low}, '{w.lower()}')" for w in badwords) + ")"
        if badwords
        else "FALSE"
    )
    kept_words = (
        f"coalesce(list_sum(list_transform({kept}, l ->"
        f" length(string_split_regex(lower(trim(l)), '\\s+')))), 0)"
    )
    n_sent = f"(length({cleaned}) - length(translate({cleaned}, '.!?', '')))"
    return (
        "struct_pack("
        f"kept_lines := length({kept})::BIGINT, "
        f"kept_words := {kept_words}::BIGINT, "
        f"n_sentences := {n_sent}::BIGINT, "
        f"has_lorem := contains({low}, 'lorem ipsum'), "
        f"has_brace := contains({expr}, '{{'), "
        f"has_badword := {has_bad})"
    )


def c4_filter_sql(
    expr: str,
    badwords: tuple[str, ...] = (),
    min_sentences: int = MIN_SENTENCES,
) -> str:
    s = c4_page_flags_sql(expr, badwords)
    return (
        f"(({s}).n_sentences >= {min_sentences}"
        f" AND NOT ({s}).has_lorem"
        f" AND NOT ({s}).has_brace"
        f" AND NOT ({s}).has_badword)"
    )
