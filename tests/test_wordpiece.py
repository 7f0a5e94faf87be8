"""WordPiece tokenizer (functions/wordpiece.py): hand-pinned MaxMatch
semantics incl. [UNK], positional seed vocabulary, likelihood-gain
merge training (vs BPE's raw frequency), determinism, round-trip."""

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.unigram import word_freqs
from spdb_spark.functions.wordpiece import (
    UNK,
    _greedy,
    train_wordpiece,
    wordpiece_seed_vocab,
    wordpiece_tokenize,
)


def test_greedy_hand_pinned():
    v = frozenset(["un", "##able", "##b", "##a", "##le", "u", "##n", "a"])
    assert _greedy("unable", v, 5) == ["un", "##able"]
    # longest-match-FIRST is not optimal-match: 'una' absent, so 'un'
    # wins at 0; then '##able' covers the rest
    v2 = frozenset(["u", "##n", "##a", "##ble", "un", "##ab", "##le"])
    assert _greedy("unable", v2, 5) == ["un", "##ab", "##le"]
    # dead position -> whole word UNK
    assert _greedy("xyz", frozenset(["x", "##y"]), 4) == [UNK]
    # continuation spelling is required after the first position
    assert _greedy("aa", frozenset(["a"]), 4) == [UNK]
    assert _greedy("aa", frozenset(["a", "##a"]), 4) == ["a", "##a"]


@pytest.fixture()
def corpus(spark):
    rows = [
        (i, " ".join(["unable", "unite", "viable"][: 1 + i % 3]))
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_seed_vocab_positional(spark, corpus):
    v = {
        r.piece
        for r in wordpiece_seed_vocab(
            word_freqs(corpus), max_piece_len=3, keep_top=6
        ).collect()
    }
    # all single chars in both spellings
    assert {"u", "##n", "##a", "##b", "##l", "##e", "v"} <= v
    # positional split: 'le' never starts a word, so only the
    # continuation spelling can exist
    assert "le" not in v
    multi = [p for p in v if len(p.replace("##", "", 1)) > 1]
    assert len(multi) == 6


def test_tokenize_round_trip_and_unk(spark, corpus):
    vocab = wordpiece_seed_vocab(word_freqs(corpus), 3, keep_top=8)
    out = {r.doc_id: r for r in
           wordpiece_tokenize(corpus, "doc_id", "text", vocab, 3).collect()}
    for row in corpus.collect():
        got = out[row.doc_id]
        rebuilt = "".join(p[2:] if p.startswith("##") else p
                          for p in got.pieces)
        assert rebuilt == "".join(row.text.split())
        assert got.n_pieces == len(got.pieces)
    # a word with a char never seen in training -> [UNK]
    df = spark.createDataFrame([(1, "unzqx")], "doc_id long, text string")
    r = wordpiece_tokenize(df, "doc_id", "text", vocab, 3).collect()[0]
    assert r.pieces == [UNK]


def test_train_prefers_likelihood_gain_over_frequency(spark):
    """'ab' occurs 8x and 'xy' 6x, but x/y occur ONLY together while
    a/b are diluted by solo appearances — WordPiece's score
    nab/(na*nb) must pick (x, ##y) first where BPE would pick (a, b)."""
    rows = (
        [(i, "ab") for i in range(8)]
        + [(100 + i, "xy") for i in range(6)]
        + [(200 + i, "az bq") for i in range(20)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = train_wordpiece(df, n_merges=1, min_count=2)
    pieces = {r.piece for r in vocab.collect()}
    # the one merged unit is the xy pair (spelled plain — it starts
    # its word), not the higher-frequency but diluted ab pair
    merged = {p for p in pieces if len(p.replace("##", "", 1)) > 1}
    assert merged == {"xy"}


def test_train_deterministic_and_encodes(spark, corpus):
    v1 = sorted((r.piece, r.cnt) for r in
                train_wordpiece(corpus, n_merges=4).collect())
    v2 = sorted((r.piece, r.cnt) for r in
                train_wordpiece(corpus.repartition(7), n_merges=4).collect())
    assert v1 == v2
    vocab = train_wordpiece(corpus, n_merges=4)
    out = wordpiece_tokenize(corpus, "doc_id", "text", vocab, 6).collect()
    assert all(UNK not in r.pieces for r in out)
    # merges actually compress: fewer pieces than characters
    total_pieces = sum(r.n_pieces for r in out)
    total_chars = sum(
        len("".join(p[2:] if p.startswith("##") else p for p in r.pieces))
        for r in out
    )
    assert total_pieces < total_chars


def test_tokenize_null_and_empty(spark):
    train = spark.createDataFrame([(0, "aa")], "doc_id long, text string")
    vocab = wordpiece_seed_vocab(word_freqs(train), 3, 4)
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "aa")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.pieces, r.n_pieces) for r in
           wordpiece_tokenize(df, "doc_id", "text", vocab, 3).collect()}
    assert got[1] == (None, None)
    assert got[2] == ([], 0)
    assert got[3] == (["aa"], 1)


def test_tokenize_is_streaming_safe(spark, tmp_path, corpus):
    """Frozen-vocab greedy encode is a stateless Arrow kernel — the
    SAME operator runs on a readStream and yields the batch pieces."""
    vocab = wordpiece_seed_vocab(word_freqs(corpus), 3, keep_top=8)
    src = str(tmp_path / "src")
    corpus.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        wordpiece_tokenize(stream, "doc_id", "text", vocab, 3)
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
            for r in wordpiece_tokenize(corpus, "doc_id", "text", vocab, 3).collect()}
    assert got == want


def test_nbsp_word_boundary_parity(spark):
    """'a\\u00a0b' is ONE word under the ASCII whitespace definition the
    trainer (tokens()) uses; the greedy Arrow kernel must treat it the
    same — the interior NBSP has no ## piece, so the WHOLE word
    collapses to [UNK] (a Unicode-aware split would wrongly emit two
    clean words)."""
    from spdb_spark.functions.wordpiece import UNK, wordpiece_tokenize

    doc = spark.createDataFrame(
        [(1, "a\u00a0b")], "doc_id long, text string"
    )
    vocab = spark.createDataFrame([("a",), ("##b",)], "piece string")
    out = wordpiece_tokenize(doc, "doc_id", "text", vocab).collect()[0]
    assert out.pieces == [UNK]
    assert out.n_pieces == 1
