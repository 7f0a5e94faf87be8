"""Unigram-LM subword tokenizer (SentencePiece-style, Kudo 2018) — the
tokenizer family next to BPE (text.py trains merges / applies them):
a vocabulary of subword PIECES with log-probabilities; encoding picks
each word's maximum-likelihood segmentation (Viterbi); training seeds
the vocabulary with frequent substrings and refines piece
probabilities by EM (forward-backward expected counts), pruning to a
target size.

Integer-protocol discipline (the repo's cross-engine rule):
- piece scores are BIGINT MICRO-NATS: logp_q = floor(ln(count/total)
  * 1e6) — the KN quantization, so Viterbi comparisons are integer;
- Viterbi ties break (score DESC, n_pieces ASC, seg ASC) — a total
  order both engines share (ASCII segments, space-joined);
- EM expected counts quantize to micro-units BEFORE the cross-
  partition sum, so training is order-independent and re-runs are
  byte-identical;
- unseen single characters at apply time score UNK_Q (a fixed floor),
  so encoding never fails on novel text.

Scale shape: everything trains on the DISTINCT-WORD table (word,
freq) — vocabulary-sized, orders below the corpus. Seeding is one
substring explode (bounded len(word) x max_piece_len) + one groupBy;
each EM iteration is one Arrow forward-backward pass over distinct
words + one piece-keyed groupBy (map-side combined); apply is one
Arrow pass over the corpus with the frozen vocab broadcast as a plain
dict (vocab-sized driver collect, like BPE's merge table). No
iteration ever touches corpus-sized state.

Reference-capability analogue: none (jhuapl-boss/spdb is voxel-only);
north-star LLM-pipeline surface (SURVEY.md) beside text.py's BPE.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spdb_spark.functions.text import tokens

UNK_Q = -30_000_000  # micro-nats for a single char never seen in training
MICRO = 1_000_000

# The Arrow kernels split words with EXACTLY Java's default \s class
# ([ \t\n\x0B\f\r] — ASCII only), matching the Spark/DuckDB tokens()
# twins. Python's own \s is Unicode-aware (U+00A0, U+2028, ...), so
# using it would train on different word boundaries than encoding uses;
# parity pinned in tests/test_unigram.py::test_nbsp_word_boundary.
WS_ASCII = "[ \t\n\x0b\f\r]+"


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the distinct-word table every
    training stage runs on. One explode + one groupBy."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _substring_grid(word, max_piece_len: int):
    """All (start, len) substrings of `word` up to max_piece_len, as a
    flat array Column — the substring-candidate explode."""
    n = F.length(word)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1), F.least(F.lit(max_piece_len), n - i + 1)
                ),
                lambda l: F.substring(word, i, l),
            ),
        )
    )


def unigram_seed_vocab(
    words: DataFrame,
    max_piece_len: int = 4,
    keep_top: int = 64,
) -> DataFrame:
    """Seed vocabulary -> (piece, cnt, logp_q): every substring of every
    word (length <= max_piece_len) counted weighted by word frequency;
    kept = ALL single characters (so any training-alphabet word stays
    segmentable) + the keep_top most frequent multi-character pieces,
    ties (cnt DESC, piece ASC). logp_q = floor(ln(cnt/total) * 1e6)
    over the KEPT total — integer micro-nats."""
    subs = words.select(
        F.explode(_substring_grid(F.col("word"), max_piece_len)).alias(
            "piece"
        ),
        F.col("freq"),
    )
    counts = subs.groupBy("piece").agg(F.sum("freq").alias("cnt"))
    chars = counts.where(F.length("piece") == 1)
    # Deterministic global top-K as sort+limit -> TakeOrderedAndProject:
    # per-partition heap then a K-row merge, NOT the single-partition
    # sort an unpartitioned row_number window would force — at web scale
    # the substring-TYPE table is hundreds of millions of rows. Same
    # kept set (ties fully broken by the unique piece key); plan shape
    # asserted in tests/test_plans.py.
    multi = (
        counts.where(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(keep_top)
    )
    kept = chars.unionByName(multi)
    total = kept.agg(F.sum("cnt").alias("_tot"))
    return kept.crossJoin(F.broadcast(total)).select(
        "piece",
        "cnt",
        F.floor(
            F.log(F.col("cnt").cast("double") / F.col("_tot")) * MICRO
        ).cast("long").alias("logp_q"),
    )


def _viterbi(word: str, vocab: dict, max_piece_len: int) -> list[str]:
    """Max-likelihood segmentation under integer piece scores; ties
    (score DESC, n_pieces ASC, seg ASC). Single chars outside the vocab
    score UNK_Q. The SQL unroll in suite_llm replays this EXACT
    recurrence — edit both together or neither."""
    n = len(word)
    # dp[j] = (neg is implicit via max) (score, np, seg) best for prefix j
    dp: list[tuple] = [(0, 0, "")] + [None] * n  # type: ignore[list-item]
    for j in range(1, n + 1):
        best = None
        for l in range(1, min(max_piece_len, j) + 1):
            piece = word[j - l : j]
            prev = dp[j - l]
            if prev is None:
                continue
            if l == 1:
                wq = vocab.get(piece, UNK_Q)
            else:
                wq = vocab.get(piece)
                if wq is None:
                    continue
            seg = piece if prev[2] == "" else prev[2] + " " + piece
            cand = (prev[0] + wq, prev[1] + 1, seg)
            if best is None or (
                (-cand[0], cand[1], cand[2]) < (-best[0], best[1], best[2])
            ):
                best = cand
        dp[j] = best
    assert dp[n] is not None  # l=1 always applies, every prefix reachable
    return dp[n][2].split(" ")


def unigram_tokenize(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    vocab: DataFrame,
    max_piece_len: int = 4,
) -> DataFrame:
    """Encode documents under a frozen unigram vocab -> (id, pieces
    array<string>, n_pieces). Words (tokens() semantics) segment
    independently; a doc's pieces concatenate in word order. One Arrow
    pass; the vocab collects to a driver dict (vocab-sized, the BPE
    merge-table posture) and ships as a Spark broadcast — one copy per
    executor, not one pickle per task batch."""
    import pandas as pd

    bc = docs.sparkSession.sparkContext.broadcast(
        {r["piece"]: int(r["logp_q"]) for r in vocab.collect()}
    )
    L = int(max_piece_len)

    def encode(batches):
        import re

        vmap = bc.value
        for pdf in batches:
            ids, pieces_out, nps = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or text is pd.NA or text != text:
                    ids.append(did)
                    pieces_out.append(None)
                    nps.append(None)
                    continue
                words = [
                    w
                    for w in re.split(WS_ASCII, str(text).lower())
                    if w
                ]
                pieces: list[str] = []
                for w in words:
                    pieces.extend(_viterbi(w, vmap, L))
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


def unigram_em_step(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
) -> DataFrame:
    """One EM iteration -> (piece, cnt_q, logp_q): E-step runs forward-
    backward per DISTINCT word (expected piece counts under the current
    probabilities, weighted by word freq, quantized to micro-units
    BEFORE the cross-partition sum — order-independent); M-step
    renormalizes to micro-nat log-probs over the same piece set.
    Pieces with zero expected count keep a floor count of 1 micro-unit
    so log stays finite (they prune next)."""
    import pandas as pd

    bc = words.sparkSession.sparkContext.broadcast(
        {r["piece"]: int(r["logp_q"]) for r in vocab.collect()}
    )
    L = int(max_piece_len)

    def estep(batches):
        vmap = bc.value
        for pdf in batches:
            acc: dict[str, int] = {}
            for word, freq in zip(pdf["word"], pdf["freq"]):
                w = str(word)
                n = len(w)
                fq = float(freq)
                # forward
                alpha = [0.0] * (n + 1)
                alpha[0] = 1.0
                for j in range(1, n + 1):
                    s = 0.0
                    for l in range(1, min(L, j) + 1):
                        piece = w[j - l : j]
                        q = vmap.get(piece)
                        if q is None:
                            if l > 1:
                                continue
                            q = UNK_Q
                        s += alpha[j - l] * math.exp(q / MICRO)
                    alpha[j] = s
                if alpha[n] <= 0.0:
                    continue
                # backward
                beta = [0.0] * (n + 1)
                beta[n] = 1.0
                for j in range(n - 1, -1, -1):
                    s = 0.0
                    for l in range(1, min(L, n - j) + 1):
                        piece = w[j : j + l]
                        q = vmap.get(piece)
                        if q is None:
                            if l > 1:
                                continue
                            q = UNK_Q
                        s += math.exp(q / MICRO) * beta[j + l]
                    beta[j] = s
                # expected counts
                z = alpha[n]
                for j in range(n):
                    for l in range(1, min(L, n - j) + 1):
                        piece = w[j : j + l]
                        q = vmap.get(piece)
                        if q is None:
                            continue
                        e = alpha[j] * math.exp(q / MICRO) * beta[j + l] / z
                        if e > 0.0:
                            acc[piece] = acc.get(piece, 0) + int(
                                math.floor(e * fq * MICRO)
                            )
            yield pd.DataFrame(
                {
                    "piece": list(acc.keys()),
                    "cnt_q": list(acc.values()),
                }
            )

    expected = (
        words.select("word", "freq")
        .mapInPandas(estep, schema="piece string, cnt_q long")
        .groupBy("piece")
        .agg(F.sum("cnt_q").alias("cnt_q"))
    )
    # M-step over the ORIGINAL piece set (unreached pieces floor at 1)
    base = vocab.select("piece").join(expected, "piece", "left").select(
        "piece",
        F.greatest(F.coalesce("cnt_q", F.lit(0)), F.lit(1)).alias("cnt_q"),
    )
    total = base.agg(F.sum("cnt_q").alias("_tot"))
    return base.crossJoin(F.broadcast(total)).select(
        "piece",
        "cnt_q",
        F.floor(
            F.log(F.col("cnt_q").cast("double") / F.col("_tot")) * MICRO
        ).cast("long").alias("logp_q"),
    )


def train_unigram(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    seed_top: int = 256,
    vocab_size: int = 128,
    em_iters: int = 2,
) -> DataFrame:
    """Full trainer: seed (frequent substrings) -> em_iters EM passes ->
    prune to vocab_size (every single character is always kept; multi-
    char pieces ranked cnt_q DESC, piece ASC) -> final renormalize.
    Returns (piece, cnt_q, logp_q). Deterministic end-to-end: re-runs
    and repartitionings produce byte-identical vocabularies (the EM
    quantization + explicit tie orders)."""
    words = word_freqs(docs, text_col)
    words = words.persist()
    try:
        vocab = unigram_seed_vocab(words, max_piece_len, seed_top)
        for _ in range(em_iters):
            vocab = unigram_em_step(words, vocab, max_piece_len)
        chars = vocab.where(F.length("piece") == 1)
        n_multi = max(vocab_size - chars.count(), 0)
        # sort+limit -> TakeOrderedAndProject (same deterministic set as
        # a ranked window, no single-partition sort; see unigram_seed_vocab)
        multi = (
            vocab.where(F.length("piece") > 1)
            .orderBy(F.col("cnt_q").desc(), F.col("piece"))
            .limit(n_multi)
        )
        kept = chars.unionByName(multi).select("piece", "cnt_q")
        total = kept.agg(F.sum("cnt_q").alias("_tot"))
        out = kept.crossJoin(F.broadcast(total)).select(
            "piece",
            "cnt_q",
            F.floor(
                F.log(F.col("cnt_q").cast("double") / F.col("_tot")) * MICRO
            ).cast("long").alias("logp_q"),
        )
        out = out.localCheckpoint(eager=True)  # result is vocab-sized
        return out
    finally:
        words.unpersist()


def corpus_logprob_q(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
) -> int:
    """Total Viterbi log-likelihood of the corpus under a vocab, in
    micro-nats (BIGINT sum — exact). The EM monotonicity tests pin
    improvement on this number."""
    import pandas as pd

    bc = docs.sparkSession.sparkContext.broadcast(
        {r["piece"]: int(r["logp_q"]) for r in vocab.collect()}
    )
    L = int(max_piece_len)

    def score(batches):
        import re

        vmap = bc.value
        for pdf in batches:
            tot = 0
            for text in pdf[text_col]:
                if text is None or text is pd.NA or text != text:
                    continue
                for w in re.split(WS_ASCII, str(text).lower()):
                    if not w:
                        continue
                    n = len(w)
                    dp = [0] + [None] * n
                    for j in range(1, n + 1):
                        best = None
                        for l in range(1, min(L, j) + 1):
                            piece = w[j - l : j]
                            q = vmap.get(piece)
                            if q is None:
                                if l > 1:
                                    continue
                                q = UNK_Q
                            prev = dp[j - l]
                            if prev is None:
                                continue
                            cand = prev + q
                            if best is None or cand > best:
                                best = cand
                        dp[j] = best
                    tot += dp[n]
            yield pd.DataFrame({"lpq": [tot]})

    rows = (
        docs.select(text_col)
        .mapInPandas(score, schema="lpq long")
        .agg(F.sum("lpq").alias("lpq"))
        .collect()
    )
    return int(rows[0]["lpq"] or 0)
