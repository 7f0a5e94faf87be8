"""WordPiece subword tokenizer (Schuster & Nakajima 2012; the BERT
tokenizer) — the third tokenizer family beside BPE (text.py) and the
unigram LM (unigram.py):

- vocabulary units carry the BERT continuation convention: a piece is
  spelled plain at word start and `##`-prefixed elsewhere, so the two
  positions are distinct vocabulary entries;
- ENCODING is greedy longest-match-first per position (no scores —
  the deterministic MaxMatch algorithm BERT ships); a position with no
  matching piece collapses the WHOLE word to `[UNK]` (BERT semantics);
- TRAINING merges the adjacent unit pair maximizing the likelihood
  gain score count(ab) / (count(a) * count(b)) — WordPiece's objective
  where BPE uses raw pair frequency — ties (score DESC, a ASC, b ASC)
  so training is deterministic.

Scale shape: training iterates on the DISTINCT-WORD table (word, freq,
units) — vocabulary-sized; each round is one pair aggregate (map-side
combined, only the argmax row reaches the driver) plus a row-local
array rewrite, the train_bpe_merges posture. Encoding is one Arrow
pass over the corpus with the vocab shipped as a frozenset (the BPE
merge-table posture). The driver gate replays seed-vocabulary
construction and the greedy match as a step-unrolled SQL program.

Reference-capability analogue: none (jhuapl-boss/spdb is voxel-only);
north-star LLM-pipeline surface (SURVEY.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNK = "[UNK]"


def wordpiece_seed_vocab(
    words: DataFrame,
    max_piece_len: int = 4,
    keep_top: int = 64,
) -> DataFrame:
    """Positional substring seed -> (piece, cnt): substrings starting at
    position 1 count as plain pieces, all others as `##`-prefixed
    continuation pieces (distinct vocabulary entries, per the BERT
    convention). Kept: every single-character unit (both spellings, so
    any training-alphabet word stays encodable) + the keep_top most
    frequent multi-character units, ties (cnt DESC, piece ASC)."""
    word = F.col("word")
    n = F.length(word)
    grid = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), n - i + 1)
                ),
                lambda l: F.when(
                    i == 1, F.substring(word, i, l)
                ).otherwise(
                    F.concat(F.lit("##"), F.substring(word, i, l))
                ),
            ),
        )
    )
    counts = (
        words.select(F.explode(grid).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    base_len = F.length(F.regexp_replace(F.col("piece"), r"^##", ""))
    chars = counts.where(base_len == 1)
    # Deterministic top-K via sort+limit -> TakeOrderedAndProject: a
    # per-partition heap + K-row merge instead of the single-partition
    # sort an unpartitioned row_number window forces (the substring-TYPE
    # table is huge at web scale). Ties fully broken by the unique piece
    # key, so the kept set is identical; asserted in tests/test_plans.py.
    multi = (
        counts.where(base_len > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(keep_top)
    )
    return chars.unionByName(multi)


def _greedy(word: str, vocab: frozenset, max_piece_len: int) -> list[str]:
    """MaxMatch: longest vocab piece at each position (plain at start,
    ## after); any dead position -> the whole word is [UNK]. The SQL
    step-unroll in suite_llm replays this exact loop."""
    n = len(word)
    out: list[str] = []
    p = 0
    while p < n:
        hit = None
        for l in range(min(max_piece_len, n - p), 0, -1):
            cand = word[p : p + l] if p == 0 else "##" + word[p : p + l]
            if cand in vocab:
                hit = cand
                break
        if hit is None:
            return [UNK]
        out.append(hit)
        p += len(hit) - 2 if hit.startswith("##") else len(hit)
    return out


def wordpiece_tokenize(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    max_piece_len: int = 4,
) -> DataFrame:
    """Encode documents -> (id, pieces array<string>, n_pieces) under a
    frozen WordPiece vocab (a DataFrame with a `piece` column). One
    Arrow pass; vocab collects to a driver frozenset (vocab-sized) and
    ships as a Spark broadcast — one copy per executor, not one pickle
    per task batch. Word boundaries use the ASCII-only Java \\s class
    (unigram.WS_ASCII) so train and apply split identically."""
    import pandas as pd

    from spdb_spark.functions.unigram import WS_ASCII

    bc = docs.sparkSession.sparkContext.broadcast(
        frozenset(r["piece"] for r in vocab.select("piece").collect())
    )
    L = int(max_piece_len)

    def encode(batches):
        import re

        vset = bc.value
        for pdf in batches:
            ids, pieces_out, nps = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or text is pd.NA or text != text:
                    ids.append(did)
                    pieces_out.append(None)
                    nps.append(None)
                    continue
                pieces: list[str] = []
                for w in re.split(WS_ASCII, str(text).lower()):
                    if w:
                        pieces.extend(_greedy(w, vset, L))
                ids.append(did)
                pieces_out.append(pieces)
                nps.append(len(pieces))
            yield pd.DataFrame(
                {id_col: ids, "pieces": pieces_out, "n_pieces": nps}
            )

    id_type = docs.schema[id_col].dataType.simpleString()
    return docs.select(id_col, text_col).mapInPandas(
        encode,
        schema=f"{id_col} {id_type}, pieces array<string>, n_pieces int",
    )


def _merge_units(units, a: str, b: str):
    """Greedy left-to-right non-overlapping merge of adjacent (a, b)
    units into one (## bookkeeping: the product keeps a's spelling and
    absorbs b's body) — row-local fold, the text._merge_adjacent shape."""
    merged = a + (b[2:] if b.startswith("##") else b)
    return F.aggregate(
        units,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_wordpiece(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
) -> DataFrame:
    """WordPiece trainer -> vocab (piece, cnt): start from character
    units (first char plain, rest ##), then n_merges rounds of fusing
    the adjacent pair with the best likelihood-gain score
    count(ab)/(count(a)*count(b)) (integer-exact comparison via
    cross-multiplication on the driver — no float ties), recount, and
    return the final unit vocabulary weighted by corpus frequency.
    Iterates on the distinct-word table; per round ONE pair aggregate
    reaches the driver as a handful of candidate rows."""
    from spdb_spark.functions.unigram import word_freqs

    words = word_freqs(docs, text_col)
    chars = F.transform(
        F.split(F.col("word"), ""),
        lambda c, i: F.when(i == 0, c).otherwise(F.concat(F.lit("##"), c)),
    )
    cur = words.select(F.col("freq"), chars.alias("units")).persist()
    try:
        for _ in range(n_merges):
            u = F.col("units")
            pairs = cur.where(F.size(u) >= 2).select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(u) - 1),
                        lambda i: F.struct(
                            F.element_at(u, i).alias("a"),
                            F.element_at(u, i + 1).alias("b"),
                        ),
                    )
                ).alias("p"),
            )
            pair_cnt = pairs.groupBy(
                F.col("p.a").alias("a"), F.col("p.b").alias("b")
            ).agg(F.sum("freq").alias("nab"))
            unit_cnt = cur.select(
                "freq", F.explode(u).alias("unit")
            ).groupBy("unit").agg(F.sum("freq").alias("n"))
            cand = (
                pair_cnt.join(
                    unit_cnt.withColumnRenamed("unit", "a").withColumnRenamed(
                        "n", "na"
                    ),
                    "a",
                )
                .join(
                    unit_cnt.withColumnRenamed("unit", "b").withColumnRenamed(
                        "n", "nb"
                    ),
                    "b",
                )
                .where(F.col("nab") >= min_count)
                # prune to a small candidate set by float score, then
                # pick the true argmax exactly on the driver
                .orderBy(
                    (
                        F.col("nab").cast("double")
                        / (F.col("na") * F.col("nb"))
                    ).desc(),
                    "a",
                    "b",
                )
                .limit(16)
                .collect()
            )
            if not cand:
                break
            # exact argmax: nab/(na*nb) as a Fraction (integer cross-
            # multiplication, no float ties), then (a ASC, b ASC)
            from fractions import Fraction

            best = min(
                cand,
                key=lambda r: (
                    -Fraction(int(r.nab), int(r.na) * int(r.nb)),
                    r.a,
                    r.b,
                ),
            )
            nxt = cur.select(
                "freq", _merge_units(F.col("units"), best.a, best.b).alias("units")
            ).persist()
            cur.unpersist()
            cur = nxt
        vocab = (
            cur.select("freq", F.explode("units").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").alias("cnt"))
        )
        return vocab.localCheckpoint(eager=True)
    finally:
        cur.unpersist()
