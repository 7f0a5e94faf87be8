"""Unigram-LM tokenizer (functions/unigram.py): hand-pinned Viterbi
semantics, EM likelihood monotonicity, deterministic re-runs, the
train -> apply round-trip, and the gate-exactness replica."""

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.unigram import (
    UNK_Q,
    _viterbi,
    corpus_logprob_q,
    train_unigram,
    unigram_em_step,
    unigram_seed_vocab,
    unigram_tokenize,
    word_freqs,
)


def test_viterbi_hand_pinned():
    # 'ab' strongly preferred over 'a'+'b'
    vocab = {"a": -3_000_000, "b": -3_000_000, "ab": -2_000_000}
    assert _viterbi("abab", vocab, 3) == ["ab", "ab"]
    # without 'ab', falls back to chars
    assert _viterbi("abab", {"a": -1, "b": -1}, 3) == ["a", "b", "a", "b"]
    # unseen char scores UNK_Q but still segments
    assert _viterbi("axb", {"a": -1, "b": -1}, 3) == ["a", "x", "b"]


def test_viterbi_tie_breaks_fewer_pieces_then_lexicographic():
    # 'ab'+'c' and 'a'+'bc' tie on score; both beat 3 chars; the
    # 2-piece candidates tie on np -> lexicographically smaller seg
    # wins: 'a bc' < 'ab c'
    vocab = {
        "a": -1_000_000,
        "b": -1_000_000,
        "c": -1_000_000,
        "ab": -2_000_000,
        "bc": -2_000_000,
    }
    assert _viterbi("abc", vocab, 3) == ["a", "bc"]


@pytest.fixture()
def corpus(spark):
    rows = [
        (i, " ".join(["banana", "bandana", "anana"][: 1 + i % 3]))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_freqs(corpus):
    got = {r.word: r.freq for r in word_freqs(corpus).collect()}
    assert got["banana"] == 40
    assert got["bandana"] == 26
    assert got["anana"] == 13


def test_seed_vocab_keeps_all_chars_and_topk(corpus):
    v = unigram_seed_vocab(word_freqs(corpus), max_piece_len=3, keep_top=5)
    rows = v.collect()
    pieces = {r.piece for r in rows}
    assert {"a", "b", "n", "d"} <= pieces
    assert len([p for p in pieces if len(p) > 1]) == 5
    assert all(r.logp_q < 0 for r in rows)


def test_em_improves_likelihood_and_is_deterministic(corpus):
    words = word_freqs(corpus)
    v0 = unigram_seed_vocab(words, max_piece_len=3, keep_top=8)
    lp0 = corpus_logprob_q(corpus, v0, max_piece_len=3)
    v1 = unigram_em_step(words, v0, max_piece_len=3)
    lp1 = corpus_logprob_q(corpus, v1, max_piece_len=3)
    # EM reallocates mass to pieces actually used by likely
    # segmentations -> Viterbi corpus likelihood must not degrade
    assert lp1 >= lp0
    # byte-identical re-run (quantized expected counts)
    v1b = unigram_em_step(words, v0, max_piece_len=3)
    a = sorted((r.piece, r.cnt_q, r.logp_q) for r in v1.collect())
    b = sorted((r.piece, r.cnt_q, r.logp_q) for r in v1b.collect())
    assert a == b
    # repartitioned input -> same vocabulary
    v1c = unigram_em_step(words.repartition(7), v0, max_piece_len=3)
    c = sorted((r.piece, r.cnt_q, r.logp_q) for r in v1c.collect())
    assert a == c


def test_train_apply_round_trip(corpus):
    vocab = train_unigram(
        corpus, max_piece_len=3, seed_top=16, vocab_size=12, em_iters=2
    )
    rows = vocab.collect()
    assert len(rows) <= 12 + 0  # chars counted inside vocab_size budget
    out = unigram_tokenize(corpus, "doc_id", "text", vocab, 3).collect()
    assert len(out) == 40
    # reconstruction: pieces of each doc concatenate to the doc's
    # words with whitespace removed (lossless round-trip)
    by_id = {r.doc_id: r for r in out}
    for row in corpus.collect():
        want = "".join(row.text.split())
        got = "".join(by_id[row.doc_id].pieces)
        assert got == want, row.doc_id
        assert by_id[row.doc_id].n_pieces == len(by_id[row.doc_id].pieces)
    # multi-char pieces actually fire (the tokenizer compresses)
    total_pieces = sum(r.n_pieces for r in out)
    total_chars = sum(len("".join(r.pieces)) for r in out)
    assert total_pieces < total_chars


def test_tokenize_null_and_empty_text(spark):
    vocab = spark.createDataFrame(
        [("a", -1_000_000)], "piece string, logp_q long"
    )
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "  "), (4, "aa")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.pieces, r.n_pieces) for r in
           unigram_tokenize(df, "doc_id", "text", vocab, 3).collect()}
    assert got[1] == (None, None)
    assert got[2] == ([], 0)
    assert got[3] == ([], 0)
    assert got[4] == (["a", "a"], 2)


def test_unk_char_scores_floor(spark):
    vocab = spark.createDataFrame(
        [("a", -1_000_000)], "piece string, logp_q long"
    )
    df = spark.createDataFrame([(1, "aqa")], "doc_id long, text string")
    r = unigram_tokenize(df, "doc_id", "text", vocab, 3).collect()[0]
    assert r.pieces == ["a", "q", "a"]
    assert UNK_Q < -20_000_000  # the floor is a real OOD penalty


def test_tokenize_is_streaming_safe(spark, tmp_path, corpus):
    """Frozen-vocab Viterbi encode is a stateless Arrow kernel — the
    SAME operator runs on a readStream and yields the batch pieces."""
    vocab = unigram_seed_vocab(word_freqs(corpus), 3, keep_top=8)
    src = str(tmp_path / "src")
    corpus.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        unigram_tokenize(stream, "doc_id", "text", vocab, 3)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = {r.doc_id: (tuple(r.pieces), r.n_pieces)
           for r in spark.read.parquet(out_dir).collect()}
    want = {r.doc_id: (tuple(r.pieces), r.n_pieces)
            for r in unigram_tokenize(corpus, "doc_id", "text", vocab, 3).collect()}
    assert got == want


def test_nbsp_word_boundary_parity(spark):
    """U+00A0 (and every other non-ASCII whitespace) is NOT a word
    boundary to Java's \\s, so tokens()/word_freqs keep 'a\\u00a0b' as
    ONE word — the Arrow apply kernel must agree (it splits with the
    ASCII-only WS_ASCII class, not Python's Unicode-aware \\s)."""
    doc = spark.createDataFrame(
        [(1, "a\u00a0b")], "doc_id long, text string"
    )
    assert [(r.word, r.freq) for r in word_freqs(doc).collect()] == [
        ("a\u00a0b", 1)
    ]
    vocab = spark.createDataFrame(
        [("a", -1_000_000), ("b", -1_000_000)], "piece string, logp_q long"
    )
    out = unigram_tokenize(doc, "doc_id", "text", vocab).collect()[0]
    # one word; the NBSP interior char segments as an UNK single char
    assert out.pieces == ["a", "\u00a0", "b"]
    assert out.n_pieces == 3
