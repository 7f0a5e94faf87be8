"""Text analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — tokenization,
language ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting. No Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.hashing import md5_long
from spdb_spark.session import truncate_lineage

# Marker stopwords per language for the n-gram/stopword language-ID
# heuristic. Deterministic tie-break: lexicographically smallest language
# code among the top scorers.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "and", "of", "is", "to"),
    "es": ("el", "la", "los", "y", "es", "de"),
    "fr": ("le", "la", "les", "et", "est", "de"),
}

EN_STOPWORDS = ("the", "a", "and", "of", "is", "to", "in", "that", "it", "for")


def tokens(c: Column) -> Column:
    """Lowercased whitespace tokens (parity with the oracle's
    regexp_split_to_array(lower(trim(s)), '\\s+'))."""
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(c: Column) -> Column:
    """Whitespace token count. Quirk shared bit-for-bit with the DuckDB
    oracle: splitting an empty/whitespace-only string yields [''] in both
    engines, so such documents count 1 pseudo-token (and mean_token_length
    0.0, not NaN). Pinned in tests/test_empty_inputs.py — change both
    engines together or neither."""
    return F.size(tokens(c)).cast("long")


def word_token_count(c: Column) -> Column:
    """BPE-ish sub-word proxy: count of [a-z]+ runs (regexp tokenizer)."""
    return F.size(F.regexp_extract_all(F.lower(c), F.lit("[a-z]+"), 0)).cast("long")


def mean_token_length(c: Column) -> Column:
    """Mean token length without exploding: non-space chars / token count."""
    n = token_count(c)
    chars = F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
    return (chars / n).cast("double")


def _hit_count(toks: Column, words: tuple[str, ...]) -> Column:
    """How many tokens (with multiplicity) are in `words` — via filter on the
    token array, no explode/shuffle."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")


def _bind_once(value: Column, body) -> Column:
    """Evaluate `value` ONCE and let `body` reference it many times: a
    transform over a single-element array binds the value to the lambda
    variable, so every reference inside `body` is a cheap variable read
    instead of a re-evaluation of the whole subtree. Catalyst duplicates
    an expression tree at every reference site, and common-subexpression
    elimination does not reach inside higher-order-function lambdas — a
    scalar built from k references to an expensive input (lang_id's four
    per-language hit counts over the SAME token split; gopher_filter's
    ten rule signals) otherwise evaluates that input k times per row
    (measured 2x on lang_id at sf0.1). Only for single-scalar outputs:
    binding a STRUCT result would re-run the lambda once per field
    extraction downstream."""
    return F.get(F.transform(F.array(value), body), 0)


def _lang_from_tokens(toks: Column) -> Column:
    """lang_id body over an already-available token array — for callers
    that stage ONE split and derive several signals from it
    (pipeline.quality_filter, the text-stats gate)."""
    ranked = F.array(
        *[
            F.struct(
                _hit_count(toks, words).alias("hits"),
                F.lit(-i).alias("rank"),
                F.lit(code).alias("code"),
            )
            for i, (code, words) in enumerate(sorted(LANG_MARKERS.items()))
        ]
    )
    top = F.array_max(ranked)
    return F.when(top["hits"] > 0, top["code"]).otherwise(F.lit("und"))


def _stopword_ratio_from_tokens(
    toks: Column, stopwords: tuple[str, ...] = EN_STOPWORDS
) -> Column:
    return (_hit_count(toks, stopwords) / F.size(toks)).cast("double")


def _quality_from_tokens(toks: Column, chars: Column) -> Column:
    """quality_score body over a staged token array and non-space char
    count (`chars` = length of the whitespace-stripped text)."""
    n = F.size(toks).cast("long")
    ratio = _stopword_ratio_from_tokens(toks)
    mean_len = (chars / n).cast("double")
    return (
        F.least(n / F.lit(100.0), F.lit(1.0)) * 0.4
        + ratio * 0.3
        + F.least(mean_len / F.lit(8.0), F.lit(1.0)) * 0.3
    ).cast("double")


def lang_id(c: Column) -> Column:
    """Language ID: argmax of per-language marker-stopword hit counts,
    ties -> lexicographically smallest code, zero hits -> 'und'.

    array_max over (hits, rank, code) structs compares fields in order; rank
    is the negated alphabetical index so ties prefer the smallest code.
    The token split is bound once (_bind_once): the four hit counts read
    the same array instead of re-splitting the text per language."""
    return _bind_once(tokens(c), _lang_from_tokens)


def stopword_ratio(c: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    return _bind_once(
        tokens(c), lambda toks: _stopword_ratio_from_tokens(toks, stopwords)
    )


def quality_score(c: Column) -> Column:
    """Composite quality in [0,1]: length target + stopword ratio + mean
    token length target (cheap heuristics standard in pretraining
    pipelines). One token split feeds all three terms (_bind_once)."""
    chars = F.length(F.regexp_replace(F.trim(c), r"\s+", ""))
    return _bind_once(tokens(c), lambda toks: _quality_from_tokens(toks, chars))


def char_ngram_fingerprint(c: Column, n: int = 8) -> Column:
    """Winnowing-style fingerprint: minimum md5 over all n-char windows
    (string min is portable — ASCII hex). Short docs fall back to whole-text
    md5."""
    win = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
        lambda i: F.md5(c.substr(i, F.lit(n))),
    )
    return F.array_min(win)


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """SimHash signature per document: bit k is the sign of the sum over
    tokens (with multiplicity) of ±1 according to bit k of the token hash.

    All `bits` balance counters evaluate inside ONE partial-aggregating
    groupBy over the exploded tokens (the minhash_signatures pattern):
    one md5 per token, `bits` conditional sums as agg columns, and the
    signature assembled as a row-local fold over the counters. The
    shuffle carries one `bits`-column row per doc per partition — the
    earlier token x bit-position explode moved 32x the rows through the
    exchange and needed a second (doc)-keyed aggregate on top (measured
    ~2x the wall at sf0.1). Returns (id_col, simhash)."""
    toks = df.select(
        id_col, F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", md5_long(F.col("tok")))
    if bits > 60:
        # md5_long is 60-bit; a second independently-salted hash supplies
        # bits 60+ so a 64-bit signature has full entropy (without this,
        # the top 4 bits would be constant zero and the top band of a
        # 4x16 split would lose discrimination)
        toks = toks.withColumn(
            "h2", md5_long(F.concat(F.lit("simhash-hi:"), F.col("tok")))
        )
    aggs = [
        F.sum(
            F.when(
                (
                    F.expr(f"shiftright(h, {k})")
                    if k < 60
                    else F.expr(f"shiftright(h2, {k - 60})")
                ).bitwiseAND(1)
                == 1,
                1,
            ).otherwise(-1)
        ).alias(f"s{k}")
        for k in range(bits)
    ]
    per = toks.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("long")
    for k in range(bits):
        # bit 63 is the long sign bit: setting it equals ADDING -2^63 in
        # two's complement (1 << 63 itself does not fit a signed long) —
        # this is what makes bits=64 signatures (the corpus-scale
        # configuration: 16-bit bands) representable in one long column
        contrib = -(1 << 63) if k == 63 else (1 << k)
        sig = sig + F.when(
            F.col(f"s{k}") > 0, F.lit(contrib).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return per.select(id_col, sig.alias("simhash"))


def word_ngrams(toks: Column, n: int = 3) -> Column:
    """Word n-grams (space-joined) from a token array.

    IMPORTANT: pass a *materialized column* (project the token array in a
    prior select), not an inline expression — Catalyst re-evaluates an
    inline array expression once per lambda element (quadratic blowup).
    Empty array when the doc has fewer than n tokens (Spark's sequence()
    would otherwise run descending)."""
    starts = F.sequence(F.lit(0), F.size(toks) - n)
    gram = lambda i: F.concat_ws(" ", *[toks[i + j] for j in range(n)])  # noqa: E731
    return F.when(F.size(toks) >= n, F.transform(starts, gram)).otherwise(
        F.array().cast("array<string>")
    )


def exploded_word_ngrams(
    df: DataFrame,
    toks_col: str,
    n: int,
    out: str = "g",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """One row per word n-gram: (keep..., out). Yields exactly the rows
    of `select(keep..., explode(word_ngrams(toks_col, n)))`, but the
    space-join runs in a POST-explode projection — whole-stage codegen —
    instead of inside transform's lambda, which Spark evaluates
    interpreted per element (the repo's measured HOF penalty; see
    minhash_lsh_dedup's signature note). Docs shorter than n yield no
    rows (word_ngrams' empty-array case), filtered BEFORE the explode so
    sequence() never runs descending."""
    t = F.col(toks_col)
    e = df.where(F.size(t) >= n).select(
        *keep,
        t.alias("_egt"),
        F.explode(F.sequence(F.lit(0), F.size(t) - n)).alias("_egi"),
    )
    gram = F.concat_ws(
        " ",
        *[
            F.element_at(F.col("_egt"), F.col("_egi") + j + 1)
            for j in range(n)
        ],
    )
    return e.select(*keep, gram.alias(out))


def repetition_stats(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Within-document repetition metrics (Gopher-style): the fraction of
    duplicate tokens and duplicate word n-grams per document.

    Entirely per-row Column math (array_distinct on the token / n-gram
    arrays) — a narrow projection with NO shuffle and NO explode, so it
    runs at scan speed on any corpus size. Ratios are floor-scaled to 6dp
    (bit-identical across engines; both divide exact small ints)."""
    toks = tokens(F.col(text_col))
    staged = df.select(F.col(id_col), toks.alias("_toks"))
    # The n-gram array gets its OWN projection stage: it is consumed
    # twice below (size + array_distinct), and the transform that
    # builds it is interpreted — inlined, Catalyst would duplicate the
    # whole n-gram build at each reference (CSE does not reach inside
    # HOF lambdas), running it twice per row.
    staged = staged.select(
        F.col(id_col),
        F.col("_toks"),
        word_ngrams(F.col("_toks"), n).alias("_g"),
    )
    staged = staged.select(
        F.col(id_col),
        F.size("_toks").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).cast("long").alias("n_distinct_tokens"),
        F.size("_g").cast("long").alias("n_ngrams"),
        F.size(F.array_distinct("_g")).cast("long").alias("n_distinct_ngrams"),
    )
    frac = lambda tot, dis: F.when(  # noqa: E731
        F.col(tot) > 0,
        F.floor((1.0 - F.col(dis) / F.col(tot)) * 1000000) / 1000000,
    ).otherwise(F.lit(0.0))
    return staged.select(
        id_col,
        "n_tokens",
        "n_ngrams",
        frac("n_tokens", "n_distinct_tokens").alias("dup_token_frac"),
        frac("n_ngrams", "n_distinct_ngrams").alias("dup_ngram_frac"),
    )


# PII patterns kept to a dialect-portable subset (no backtracking-only
# constructs): identical leftmost matching under Java regex and RE2.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}[- ]\d{3}[- ]\d{3,4}[- ]\d{3,4}", "<PHONE>"),
)


def redact_pii(c: Column) -> Column:
    """Replace email / IPv4 / international-phone spans with typed tags.
    Chained regexp_replace — JVM-side, codegen'd, no UDF."""
    out = c
    for _, pat, tag in PII_PATTERNS:
        out = F.regexp_replace(out, pat, tag)
    return out


def pii_counts(c: Column) -> list[Column]:
    """Per-kind match counts (regexp_count, JVM-side)."""
    return [
        F.regexp_count(c, F.lit(pat)).cast("long").alias(f"n_{kind}")
        for kind, pat, _ in PII_PATTERNS
    ]


def bpe_pair_counts(df: DataFrame, text_col: str, top_n: int = 30) -> DataFrame:
    """Tokenizer-training primitive: the top adjacent-token-pair counts
    over the corpus (the statistic a BPE trainer maximizes each merge
    step). Explode bigrams -> partial+final count -> deterministic top-N
    by (count DESC, pair ASC). The explode feeds map-side partial
    aggregation, so the shuffle carries vocabulary-pair rows, not corpus
    rows; the final top-N is a TakeOrdered over the pair vocabulary."""
    staged = df.select(tokens(F.col(text_col)).alias("_toks"))
    pairs = exploded_word_ngrams(staged, "_toks", 2, out="pair")
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair"))
        .limit(top_n)
    )


def _merge_adjacent(toks: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) into
    the single token "a b" inside one token array (row-local fold)."""
    return F.aggregate(
        toks,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(f"{a} {b}")),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(
    df: DataFrame, text_col: str, n_merges: int = 10, min_count: int = 2
) -> list[tuple[int, str, str, int]]:
    """Iterative BPE merge training (word-level merge proxy, consistent
    with `bpe_pair_counts` being one step of it): each round counts
    adjacent-token pairs corpus-wide, fuses the most frequent pair
    everywhere (greedy left-to-right, ties broken (count DESC, a ASC,
    b ASC) so the result is deterministic), and repeats. Returns the
    ordered merge table [(step, a, b, count)] — the artifact a tokenizer
    ships.

    Scale shape per round: ONE vocabulary-sized pair aggregate (explode
    feeds map-side partials; only the single best row reaches the
    driver) plus a narrow row-local array rewrite. Lineage is
    localCheckpoint-truncated every 3 rounds (the dup_clusters pattern)
    so plan depth stays bounded for large merge tables. Tokenizers train
    on a corpus sample in practice — compose with
    `sampling.hash_split`/`stratified_sample` upstream."""
    t = F.col("_toks")
    cur = df.select(tokens(F.col(text_col)).alias("_toks")).persist()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        pairs = cur.where(F.size(t) >= 2).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - 1),
                    lambda i: F.struct(
                        F.element_at(t, i).alias("a"),
                        F.element_at(t, i + 1).alias("b"),
                    ),
                )
            ).alias("p")
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.count("*").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0].n < min_count:
            break
        a, b, n = top[0].a, top[0].b, int(top[0].n)
        merges.append((step, a, b, n))
        nxt = cur.select(_merge_adjacent(t, a, b).alias("_toks"))
        if (step + 1) % 3 == 0:
            nxt = truncate_lineage(nxt, eager=True)
        else:
            nxt = nxt.persist()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


def apply_bpe_merges(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list,
    engine: str = "arrow",
) -> DataFrame:
    """Encode documents with a trained merge table (the inference side of
    `train_bpe_merges`): (id, bpe_tokens) after applying every merge in
    training order. Accepts (step, a, b, n) or (a, b) rows.

    engine="column": a chain of row-local merge folds — pure Catalyst,
    right for short merge tables (codegen depth grows with table length).
    engine="arrow" (default): one mapInPandas pass applying the whole
    table per batch — the shape for production-sized tables (tokenizers
    are sequential per token; batch-level Arrow is the standard posture,
    cf. the blob codec). Both engines produce identical output
    (test-pinned)."""
    order = [(m[1], m[2]) if len(m) == 4 else (m[0], m[1]) for m in merges]
    if engine == "column":
        toks = tokens(F.col(text_col))
        for a, b in order:
            toks = _merge_adjacent(toks, a, b)
        return df.select(F.col(id_col), toks.alias("bpe_tokens"))

    import re

    import pandas as pd

    def encode(batches):
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                if text is None or text is pd.NA or text != text:
                    # null text -> null tokens, matching tokens(col) = null
                    out.append(None)
                    continue
                # exact tokens() semantics: split(lower(trim(s)), '\s+') —
                # Spark's trim strips only ' ' and Java's \s is the ASCII
                # class (Python's is Unicode-aware), so mirror both
                # literally; empty/whitespace-only text yields [''] in
                # both engines
                toks = re.split(
                    r"[ \t\n\x0b\f\r]+", str(text).strip(" ").lower()
                )
                for a, b in order:
                    res: list[str] = []
                    for x in toks:
                        if res and res[-1] == a and x == b:
                            res[-1] = f"{a} {b}"
                        else:
                            res.append(x)
                    toks = res
                out.append(toks)
            yield pd.DataFrame({id_col: pdf[id_col], "bpe_tokens": out})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        encode, schema=f"{id_col} {id_type}, bpe_tokens array<string>"
    )


def normalize_text(c: Column) -> Column:
    """Portable text normalization for matching/dedup keys: lowercase,
    every run of non-alphanumerics (punctuation, control chars,
    whitespace) collapsed to a single space, trimmed. The regex uses only
    explicit classes shared by Java regex and RE2, so the DuckDB oracle
    reproduces it byte-for-byte — the normalization a fuzzy-dedup or
    URL/boilerplate pipeline applies before hashing."""
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))
