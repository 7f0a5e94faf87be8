"""Gopher-style document quality rules (Rae et al. 2021, public), as
shuffle-free Column expressions.

The published rule set that became the de-facto pretraining filter:
word-count bounds, mean-word-length bounds, symbol-to-word ratio
(hashes + ellipses), bullet-started and ellipsis-ended line fractions,
alphabetic-word fraction, a minimum of distinct common-stopword hits,
and (from the same repetition family) the duplicate-line fraction.

Every signal is a higher-order array / regexp Column expression — a pure
projection inside the scan stage, zero exchanges, no Python — and every
regex is RE2-compatible, with `gopher_flags_sql` emitting the equivalent
DuckDB struct for gate oracles.

Complements functions/text.py: `quality_score` is the soft composite,
`repetition_stats` the n-gram repetition aggregate; this module is the
hard published rule set with its published defaults.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from spdb_spark.functions.text import mean_token_length, token_count, tokens

# The Gopher paper's "must contain at least 2 of" common-word list.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Published default thresholds.
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_RATIO = 0.1
MAX_BULLET_FRAC = 0.9
MAX_ELLIPSIS_FRAC = 0.3
MIN_ALPHA_FRAC = 0.8
MIN_STOP_HITS = 2
MAX_DUP_LINE_FRAC = 0.3

_BULLET_RE = r"^(-|\*|•|‣|▪)"
_ELLIPSIS_RE = r"(\.\.\.|…)$"


def _lines(c: Column) -> Column:
    return F.filter(
        F.transform(F.split(c, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )


def gopher_quality_flags(c: Column) -> Column:
    """struct of the raw signals (all DOUBLE/LONG, deterministic):
    word_count, mean_word_len, symbol_ratio, bullet_frac, ellipsis_frac,
    alpha_frac, stop_hits, dup_line_frac."""
    words = tokens(c)
    wc = token_count(c)
    lines = _lines(c)
    nl = F.size(lines)
    nl_safe = F.when(nl > 0, nl.cast("double")).otherwise(F.lit(1.0))
    hashes = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    dots = (
        F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    uni = F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit("")))
    stop_hits = None
    for w in GOPHER_STOPS:
        hit = F.array_contains(words, w).cast("long")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    return F.struct(
        wc.alias("word_count"),
        mean_token_length(c).alias("mean_word_len"),
        ((hashes + dots + uni) / wc).cast("double").alias("symbol_ratio"),
        (
            F.size(F.filter(lines, lambda l: l.rlike(_BULLET_RE))) / nl_safe
        ).cast("double").alias("bullet_frac"),
        (
            F.size(F.filter(lines, lambda l: l.rlike(_ELLIPSIS_RE))) / nl_safe
        ).cast("double").alias("ellipsis_frac"),
        (F.size(F.filter(words, lambda w: w.rlike("[a-z]"))) / wc)
        .cast("double")
        .alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        (
            F.lit(1.0) - F.size(F.array_distinct(lines)) / nl_safe
        ).cast("double").alias("dup_line_frac"),
    )


def gopher_filter(c: Column) -> Column:
    """True iff the document passes every published Gopher rule.

    NOT gopher_quality_flags + field extraction: Catalyst simplifies
    GetStructField(CreateNamedStruct) by inlining each field's whole
    expression tree at each reference site, so the ten rule checks
    would re-evaluate the token split / line split up to ~14 times per
    row (CSE does not reach inside higher-order-function lambdas). The
    token and line arrays are bound ONCE (text._bind_once) and every
    signal reads the bound arrays; each signal expression is otherwise
    identical to its gopher_quality_flags twin, so the boolean is
    value-identical."""
    from spdb_spark.functions.text import _bind_once

    def body(b: Column) -> Column:
        words, lines = b["w"], b["ln"]
        wc = F.size(words).cast("long")
        nl = F.size(lines)
        nl_safe = F.when(nl > 0, nl.cast("double")).otherwise(F.lit(1.0))
        hashes = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
        dots = (
            F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))
        ) / F.lit(3)
        uni = F.length(c) - F.length(F.replace(c, F.lit("…"), F.lit("")))
        chars = F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
        mean_word_len = (chars / wc).cast("double")
        stop_hits = None
        for w in GOPHER_STOPS:
            hit = F.array_contains(words, w).cast("long")
            stop_hits = hit if stop_hits is None else stop_hits + hit
        symbol_ratio = ((hashes + dots + uni) / wc).cast("double")
        bullet_frac = (
            F.size(F.filter(lines, lambda l: l.rlike(_BULLET_RE))) / nl_safe
        ).cast("double")
        ellipsis_frac = (
            F.size(F.filter(lines, lambda l: l.rlike(_ELLIPSIS_RE))) / nl_safe
        ).cast("double")
        alpha_frac = (
            F.size(F.filter(words, lambda t: t.rlike("[a-z]"))) / wc
        ).cast("double")
        dup_line_frac = (
            F.lit(1.0) - F.size(F.array_distinct(lines)) / nl_safe
        ).cast("double")
        return (
            (wc >= MIN_WORDS)
            & (wc <= MAX_WORDS)
            & (mean_word_len >= MIN_MEAN_WORD_LEN)
            & (mean_word_len <= MAX_MEAN_WORD_LEN)
            & (symbol_ratio <= MAX_SYMBOL_RATIO)
            & (bullet_frac <= MAX_BULLET_FRAC)
            & (ellipsis_frac <= MAX_ELLIPSIS_FRAC)
            & (alpha_frac >= MIN_ALPHA_FRAC)
            & (stop_hits >= MIN_STOP_HITS)
            & (dup_line_frac <= MAX_DUP_LINE_FRAC)
        )

    return _bind_once(
        F.struct(tokens(c).alias("w"), _lines(c).alias("ln")), body
    )


# ---------------------------------------------------------------------------
# DuckDB twins (RE2; explicit 'g' on global replaces; same empty-string
# token quirk as functions/text.py — both engines split '' to ['']).
# ---------------------------------------------------------------------------


def gopher_flags_sql(expr: str) -> str:
    words = f"string_split_regex(lower(trim({expr})), '\\s+')"
    wc = f"length({words})"
    chars = f"length(regexp_replace(trim({expr}), '\\s+', '', 'g'))"
    lines = (
        f"list_filter(list_transform(string_split({expr}, chr(10)),"
        f" l -> trim(l)), l -> length(l) > 0)"
    )
    nl = f"length({lines})"
    nl_safe = f"(CASE WHEN {nl} > 0 THEN {nl}::DOUBLE ELSE 1.0 END)"
    hashes = f"(length({expr}) - length(replace({expr}, '#', '')))"
    dots = f"(length({expr}) - length(replace({expr}, '...', ''))) / 3"
    uni = f"(length({expr}) - length(replace({expr}, '…', '')))"
    stop_hits = " + ".join(
        f"list_contains({words}, '{w}')::BIGINT" for w in GOPHER_STOPS
    )
    return (
        "struct_pack("
        f"word_count := {wc}::BIGINT, "
        f"mean_word_len := ({chars}::DOUBLE / {wc}), "
        f"symbol_ratio := (({hashes} + {dots} + {uni})::DOUBLE / {wc}), "
        f"bullet_frac := (length(list_filter({lines},"
        f" l -> regexp_matches(l, '{_BULLET_RE}')))::DOUBLE / {nl_safe}), "
        f"ellipsis_frac := (length(list_filter({lines},"
        f" l -> regexp_matches(l, '{_ELLIPSIS_RE}')))::DOUBLE / {nl_safe}), "
        f"alpha_frac := (length(list_filter({words},"
        f" w -> regexp_matches(w, '[a-z]')))::DOUBLE / {wc}), "
        f"stop_hits := ({stop_hits}), "
        f"dup_line_frac := (1.0 - length(list_distinct({lines}))::DOUBLE"
        f" / {nl_safe}))"
    )


def gopher_filter_sql(expr: str) -> str:
    s = gopher_flags_sql(expr)
    return (
        f"(({s}).word_count BETWEEN {MIN_WORDS} AND {MAX_WORDS}"
        f" AND ({s}).mean_word_len BETWEEN {MIN_MEAN_WORD_LEN} AND {MAX_MEAN_WORD_LEN}"
        f" AND ({s}).symbol_ratio <= {MAX_SYMBOL_RATIO}"
        f" AND ({s}).bullet_frac <= {MAX_BULLET_FRAC}"
        f" AND ({s}).ellipsis_frac <= {MAX_ELLIPSIS_FRAC}"
        f" AND ({s}).alpha_frac >= {MIN_ALPHA_FRAC}"
        f" AND ({s}).stop_hits >= {MIN_STOP_HITS}"
        f" AND ({s}).dup_line_frac <= {MAX_DUP_LINE_FRAC})"
    )
