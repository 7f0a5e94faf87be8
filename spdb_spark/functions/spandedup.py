"""Exact duplicate-SPAN removal: substring-level deduplication in the
style of Lee et al. 2022 ("Deduplicating Training Data Makes Language
Models Better", ExactSubstr — public method). Document- and
paragraph-level dedup miss long verbatim runs embedded in otherwise
distinct pages (licenses, boilerplate disclaimers, quoted passages);
span removal cuts the repeated run itself and keeps the rest of the
document.

Spark-first shape (the suffix-array of the reference implementation is
a single-machine structure; the distributed equivalent is hashed token
windows, the same trade minhash makes against exact all-pairs):

1. slide a token window of `window` tokens, stride `stride`, over every
   document — one projection + one explode, linear in tokens;
2. a window is DUPLICATED iff its hash occurs >= `min_count` times
   corpus-wide (within- and cross-document occurrences both count) —
   one hash-keyed groupBy + a semi join back, never an all-pairs
   comparison and never a corpus-sized broadcast. The hash is
   xxhash64 over the token SLICE itself (no per-window string build,
   no digest): outputs depend on the hash only through which window
   CONTENTS collide, and 64-bit xxhash64 is at least the collision
   class of the 60-bit truncated md5 it replaced (the DuckDB twin
   keeps its own md5-keyed detection — both sides group identical
   content identically);
3. per document, duplicated window starts merge into spans (equal-width
   intervals, merged with one in-row array fold), and the kept tokens
   reassemble — array ops inside the row, no token-level explode of the
   corpus beyond the window hashing.

POLICY: `keep` selects the repair semantics. `keep="none"` (default)
removes EVERY occurrence of a duplicated span — stricter than Lee et
al.'s repair, zero extra passes. `keep="first"` preserves the
canonical first occurrence of each duplicated window — the
min-(doc_id, start) occurrence per hash — matching Lee et al.'s
keep-one-copy semantics WITHOUT a corpus-wide sort: the canonical pick
is one more partial-aggregating min-struct over the already-built
window table plus one dup-hash-keyed equi-join (the firsts side is one
row per duplicated hash, broadcast-sized relative to the corpus).
Resolution is `stride` tokens: a duplicated run is detected when it
covers at least one full window, so runs shorter than `window` tokens
survive (Lee et al. use 50 BPE tokens; `window` plays that role here).

RECALL NOTE: with stride > 1, two occurrences of a run are detected
only when they contain an ALIGNED window (identical content at window
starts on each side's stride grid) — occurrences offset by a non-stride
phase can be missed. stride=1 recovers full exact-substring sensitivity
at window-per-token cost (the suffix-array equivalent); larger strides
are the recall-for-cost dial, exactly like LSH banding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.text import tokens


def duplicate_windows(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    stride: int = 10,
    min_count: int = 2,
    keep: str = "none",
) -> DataFrame:
    """(id, start, h) for every window whose hash (xxhash64 of the
    token slice) occurs >= min_count times corpus-wide. With
    keep="first", the canonical first occurrence of each duplicated
    hash — min (id, start) — is EXCLUDED from the output, so downstream
    removal preserves one copy of every duplicated run (Lee et al.'s
    repair semantics)."""
    if keep not in ("none", "first"):
        raise ValueError("keep must be 'none' or 'first'")
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    # window hashing POST-explode: explode the start-index sequence and
    # hash in a plain projection (whole-stage codegen) instead of inside
    # transform's interpreted lambda. The hash is xxhash64 over the token
    # SLICE directly — no window string is ever built and no md5/conv
    # digest runs; this is the hot loop of the operator at stride=1, and
    # it executes twice (the count build and the semi-join probe share no
    # exchange, so the probe side re-derives)
    from spdb_spark.session import where_above

    n = F.size(F.col("_t"))
    n_wins = (F.floor((n - window) / stride) + 1).cast("int")
    # where_above: the length gate must read the PROJECTED token array —
    # pushed below the projection it re-runs the whitespace split inside
    # the Filter, doubling the tokenize cost of BOTH window passes.
    wins = (
        where_above(toks, n >= window)
        .select(
            id_col,
            "_t",
            F.explode(F.sequence(F.lit(0), n_wins - 1)).alias("_j"),
        )
        .select(
            id_col,
            (F.col("_j") * stride).alias("start"),
            F.xxhash64(
                F.slice(F.col("_t"), F.col("_j") * stride + 1, window)
            ).alias("h"),
        )
    )
    dup_h = (
        wins.groupBy("h")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= min_count)
        .select("h")
    )
    dup = wins.join(dup_h, "h", "left_semi")
    if keep == "first":
        # one row per duplicated hash (min-struct: reducing partials, no
        # window/no sort), joined back on the hash key — the occurrence
        # equal to its hash's canonical pick survives
        firsts = dup.groupBy("h").agg(
            F.min(F.struct(F.col(id_col), F.col("start"))).alias("_f")
        )
        dup = (
            dup.join(firsts, "h")
            .where(
                ~(
                    (F.col(id_col) == F.col(f"_f.{id_col}"))
                    & (F.col("start") == F.col("_f.start"))
                )
            )
            .drop("_f")
        )
    return dup


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 20,
    stride: int = 10,
    min_count: int = 2,
    keep: str = "none",
) -> DataFrame:
    """docs -> (id, clean_text, n_tokens, n_removed): duplicated spans
    cut from every document (empty clean_text when the whole doc was
    duplicated runs). keep="first" preserves the min-(id, start)
    occurrence of each duplicated window (see module POLICY note)."""
    dups = duplicate_windows(
        docs, id_col, text_col, window, stride, min_count, keep=keep
    )
    starts = dups.groupBy(id_col).agg(
        F.sort_array(F.collect_list("start")).alias("_starts")
    )
    toks = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_t"))
    j = toks.join(starts, id_col, "left")
    t = F.col("_t")
    # merge equal-width intervals [s, s+window) over the sorted starts:
    # extend the last span when the next start overlaps it, else append
    spans = F.aggregate(
        F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
        F.array().cast("array<struct<s:int,e:int>>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (s <= F.element_at(acc, -1)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        F.element_at(acc, -1)["s"].alias("s"),
                        F.greatest(
                            F.element_at(acc, -1)["e"], s + window
                        ).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(s.alias("s"), (s + window).alias("e"))
                ),
            )
        ),
    )
    # The merged spans MUST be materialized as their own projected
    # column before the per-token filter references them: inlined, the
    # whole O(starts²) merge fold re-evaluates once per token index
    # (the quadratic-inlining trap word_ngrams documents) — measured
    # ~4x the operator wall at sf0.1 stride=1.
    staged = j.select(id_col, "_t", spans.alias("_spans"))
    n = F.size(t)
    kept = F.filter(
        F.sequence(F.lit(0), n - 1),
        lambda i: ~F.exists(
            F.col("_spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
        ),
    )
    kept = F.when(n > 0, kept).otherwise(F.array().cast("array<int>"))
    # Fast path for the (dominant) span-free docs: with no spans the
    # rebuild is exactly the tokens re-joined — a codegen'd array_join —
    # so the interpreted per-token exists() filter + transform only run
    # for rows that actually carry spans (CASE WHEN evaluates one branch
    # per row). Identical output: filter-nothing + transform + join ≡
    # array_join(tokens).
    no_spans = F.size("_spans") == 0
    rebuilt = F.array_join(
        F.transform(kept, lambda i: F.element_at(t, i + 1)), " "
    )
    return staged.select(
        id_col,
        F.when(no_spans, F.array_join(t, " "))
        .otherwise(rebuilt)
        .alias("clean_text"),
        n.cast("long").alias("n_tokens"),
        F.when(no_spans, F.lit(0).cast("long"))
        .otherwise((n - F.size(kept)).cast("long"))
        .alias("n_removed"),
    )
