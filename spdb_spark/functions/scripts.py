"""Unicode script (writing-system) profiling — the language-ID
companion signal CCNet-class pipelines compute per document: the ratio
of characters in each major script and the dominant script. A Latin
"lang=en" verdict over 60% Cyrillic text is a mislabel; script ratios
catch transliteration spam, mixed-script SEO text, and mojibake
(high OTHER ratio) that pure n-gram language ID misses.

Pure Column expressions: one regexp_count per script class over
explicit codepoint ranges shared verbatim by Java regex and RE2, so the
DuckDB twin replays byte-for-byte. Ratios quantize to 1e-6 floors
(the repo's float protocol); the dominant script is an integer-count
argmax with alphabetical tie-break. Zero exchanges — the whole profile
rides the scan projection.

Reference-capability analogue: none (jhuapl-boss/spdb is voxel-only);
north-star text-analysis surface (SURVEY.md) beside text.lang_id.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Explicit BMP ranges — deliberately the core blocks only (no
# extensions): the signal wants "which writing system dominates", not
# full Unicode coverage; ranges are identical in Java regex and RE2.
# Supplementary-plane characters (emoji, CJK ext-B, ...) fall into
# `other` and count ONCE in both engines — Java regex classes are
# codepoint-aware (no surrogate double-count) and RE2 walks UTF-8
# runes; parity pinned in tests/test_scripts.py::test_non_bmp_parity.
# \x{...} codepoint escapes: the ONE spelling both Java regex and RE2
# accept (Java-only \uXXXX would break the DuckDB twin).
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", "A-Za-z\\x{00C0}-\\x{024F}"),
    ("cyrillic", "\\x{0400}-\\x{04FF}"),
    ("greek", "\\x{0370}-\\x{03FF}"),
    ("arabic", "\\x{0600}-\\x{06FF}"),
    ("hebrew", "\\x{0590}-\\x{05FF}"),
    ("devanagari", "\\x{0900}-\\x{097F}"),
    ("cjk", "\\x{4E00}-\\x{9FFF}"),
    ("kana", "\\x{3040}-\\x{30FF}"),
    ("hangul", "\\x{AC00}-\\x{D7AF}"),
)

_LETTERISH = "".join(r for _, r in SCRIPT_RANGES)


def script_counts(c: Column) -> Column:
    """-> struct<latin,...,hangul,other,total bigint>: per-script
    character counts; `other` = letter-bearing chars outside every
    listed script is approximated as total non-space, non-ASCII-digit/
    punct chars not matched by any range; `total` = all counted chars.
    Whitespace, ASCII digits and ASCII punctuation are script-neutral
    and excluded from total."""
    fields = [
        F.regexp_count(c, F.lit(f"[{rng}]")).cast("long").alias(name)
        for name, rng in SCRIPT_RANGES
    ]
    neutral = r"\s0-9!-/:-@\[-`{-~"
    counted = F.regexp_count(
        c, F.lit(f"[^{neutral}]")
    ).cast("long")
    matched = None
    for f_ in fields:
        matched = f_ if matched is None else matched + f_
    # rebuild fields (Columns are immutable expressions — safe to reuse)
    fields = [
        F.regexp_count(c, F.lit(f"[{rng}]")).cast("long").alias(name)
        for name, rng in SCRIPT_RANGES
    ]
    return F.struct(
        *fields,
        F.greatest(counted - matched, F.lit(0).cast("long")).alias("other"),
        counted.alias("total"),
    )


def script_profile(
    df,
    text: Column,
    ratios: tuple[str, ...] = ("latin", "cyrillic", "cjk", "arabic"),
    id_cols: tuple[str, ...] = ("doc_id",),
):
    """df + (dominant, <script>_q ...) computed from ONE evaluation of
    the counts struct: the struct lands behind a projection boundary
    and every downstream expression reads its FIELDS, so the plan holds
    one set of regexp_counts instead of one per consumer. (The naive
    composition re-expands script_counts inside every ratio and every
    dominant-candidate — measured 3x the plan-build and execution time
    of this form at sf0.1; Catalyst's CollapseProject correctly
    declines to inline a multiply-referenced non-cheap projection, so
    the barrier holds.)"""
    tmp = df.select(*id_cols, script_counts(text).alias("_sc"))
    sc = F.col("_sc")
    return tmp.select(
        *id_cols,
        _dominant_from_counts(sc).alias("dominant"),
        *[_ratio_from_counts(sc, s).alias(f"{s}_q") for s in ratios],
    )


def _dominant_from_counts(s: Column) -> Column:
    names = [name for name, _ in SCRIPT_RANGES] + ["other"]
    pairs = F.array(
        *[
            F.struct(s[n].alias("n"), F.lit(n).alias("name"))
            for n in sorted(names)
        ]
    )
    best = F.array_max(
        F.transform(
            pairs,
            lambda p: F.struct(
                p["n"].alias("n"),
                # alphabetical tie-break under array_max: invert the
                # name ordering via a negated rank so the SMALLEST name
                # wins among equal counts
                (-F.array_position(
                    F.array(*[F.lit(n) for n in sorted(names)]), p["name"]
                )).alias("rk"),
                p["name"].alias("name"),
            ),
        )
    )
    return F.when(s["total"] > 0, best["name"])


def dominant_script(c: Column) -> Column:
    """Name of the script with the most characters ('other' included;
    ties alphabetical; NULL for text with zero counted chars). For
    multi-signal profiles prefer script_profile (single counts
    evaluation)."""
    return _dominant_from_counts(script_counts(c))


def _ratio_from_counts(s: Column, script: str) -> Column:
    return F.when(
        s["total"] > 0,
        F.floor(s[script].cast("double") / s["total"] * 1e6) / 1e6,
    ).otherwise(F.lit(0.0))


def script_ratio(c: Column, script: str) -> Column:
    """floor(count(script)/total * 1e6)/1e6 — 0.0 for empty text."""
    return _ratio_from_counts(script_counts(c), script)


# ---------------------------------------------------------------------------
# DuckDB twins
# ---------------------------------------------------------------------------


def _count_sql(expr: str, rng: str) -> str:
    return f"len(regexp_extract_all({expr}, '[{rng}]'))"


def script_ratio_sql(expr: str, script: str) -> str:
    rng = dict(SCRIPT_RANGES)[script]
    neutral = r"\s0-9!-/:-@\[-`{-~"
    total = _count_sql(expr, neutral.join(["^", ""]))  # [^...] class
    return (
        f"(CASE WHEN {total} > 0 THEN"
        f" FLOOR({_count_sql(expr, rng)}::DOUBLE / {total} * 1e6) / 1e6"
        f" ELSE 0.0 END)"
    )


def dominant_script_sql(expr: str) -> str:
    neutral = r"\s0-9!-/:-@\[-`{-~"
    total = _count_sql(expr, neutral.join(["^", ""]))
    names = sorted([n for n, _ in SCRIPT_RANGES] + ["other"])
    matched = " + ".join(_count_sql(expr, r) for _, r in SCRIPT_RANGES)
    counts = {n: _count_sql(expr, r) for n, r in SCRIPT_RANGES}
    counts["other"] = f"greatest({total} - ({matched}), 0)"
    structs = ", ".join(
        f"{{'n': {counts[n]}, 'rk': -{i + 1}, 'name': '{n}'}}"
        for i, n in enumerate(names)
    )
    return (
        f"(CASE WHEN {total} > 0 THEN"
        f" list_max([{structs}]).name ELSE NULL END)"
    )
