"""Interpolated Kneser-Ney trigram LM: pinned against an independent
plain-Python reference, plus the normalization law (the distribution
actually sums to 1 over the vocabulary — the smoothing is a probability
model, not just a formula), edge cases, and plan shape."""

import math
import re
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.ngramlm import kn_perplexity, kn_trigram_logprob

D = 0.75

CORPUS = {
    0: "the cat sat on the mat",
    1: "the cat sat on the hat",
    2: "the dog sat on the mat",
    3: "a dog ran to the park",
    4: "the cat ran to the park",
    5: "short doc",  # < 3 tokens: excluded
    6: "one",  # excluded
    7: "the the the the",  # degenerate repetition
    8: "park the to ran dog a",  # reversed: atypical order, valid trigrams
}


def _ref_model(docs: dict[int, str]):
    toks = {
        i: re.split(r"\s+", t.strip().lower()) for i, t in docs.items()
    }
    toks = {i: t for i, t in toks.items() if len(t) >= 3}
    grams = {
        i: [(t[j], t[j + 1], t[j + 2]) for j in range(len(t) - 2)]
        for i, t in toks.items()
    }
    c3 = Counter(g for gs in grams.values() for g in gs)
    ctx, t3, cont2, n2ctx = Counter(), Counter(), Counter(), Counter()
    t2 = defaultdict(set)
    for (u, v, w), c in c3.items():
        ctx[(u, v)] += c
        t3[(u, v)] += 1
        cont2[(v, w)] += 1
        n2ctx[v] += 1
        t2[v].add(w)
    cont1 = defaultdict(set)
    for v, w in cont2:
        cont1[w].add(v)
    n1cont = {w: len(vs) for w, vs in cont1.items()}
    n2types, t1 = len(cont2), len(n1cont)
    vocab = {tok for t in toks.values() for tok in t}

    def p3(u, v, w):
        p1 = (
            max(n1cont.get(w, 0) - D, 0) / n2types
            + D * t1 / n2types / len(vocab)
        )
        p2 = (
            max(cont2.get((v, w), 0) - D, 0) / n2ctx[v]
            + D * len(t2[v]) / n2ctx[v] * p1
        )
        return (
            max(c3.get((u, v, w), 0) - D, 0) / ctx[(u, v)]
            + D * t3[(u, v)] / ctx[(u, v)] * p2
        )

    return grams, p3, ctx, vocab


def _ref_scores(docs: dict[int, str]):
    grams, p3, _, _ = _ref_model(docs)
    out = {}
    for i, gs in grams.items():
        lpq = [math.floor(math.log(p3(*g)) * 1e6) for g in gs]
        out[i] = (math.floor(sum(lpq) / len(lpq)) / 1e6, len(lpq))
    return out


def test_normalization_law():
    """sum_w P3(w | u, v) == 1 over the corpus vocabulary, for every
    observed context — interpolated KN is a real distribution."""
    _, p3, ctx, vocab = _ref_model(CORPUS)
    for u, v in ctx:
        total = sum(p3(u, v, w) for w in vocab)
        assert abs(total - 1.0) < 1e-9, (u, v, total)


def test_spark_matches_reference_exactly(spark):
    df = spark.createDataFrame(
        list(CORPUS.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.mean_logprob, r.n_trigrams)
        for r in kn_trigram_logprob(df).collect()
    }
    assert got == _ref_scores(CORPUS)


def test_short_docs_excluded(spark):
    df = spark.createDataFrame(
        list(CORPUS.items()), "doc_id long, text string"
    )
    ids = {r.doc_id for r in kn_trigram_logprob(df).collect()}
    assert 5 not in ids and 6 not in ids and 7 in ids


def test_typical_doc_scores_above_reversed(spark):
    """Doc 8 is doc 3's tokens reversed: same unigrams, alien trigram
    order — the LM must rank it well below the in-distribution docs."""
    scores = _ref_scores(CORPUS)
    assert scores[8][0] < scores[3][0]
    assert scores[8][0] < min(scores[i][0] for i in (0, 1, 2, 4))


def test_perplexity_relation(spark):
    df = spark.createDataFrame(
        list(CORPUS.items()), "doc_id long, text string"
    )
    lp = {r.doc_id: r.mean_logprob for r in kn_trigram_logprob(df).collect()}
    px = {r.doc_id: r.perplexity for r in kn_perplexity(df).collect()}
    for i, m in lp.items():
        assert px[i] == math.floor(math.exp(-m) * 1e6) / 1e6


def _ref_ngram_model(docs: dict[int, str], n: int):
    """Generalized order-n replica: suffix type tables + continuation
    counts derived from the top order, as the production recursion."""
    toks = {i: re.split(r"\s+", t.strip().lower()) for i, t in docs.items()}
    toks = {i: t for i, t in toks.items() if len(t) >= n}
    grams = {
        i: [tuple(t[j : j + n]) for j in range(len(t) - n + 1)]
        for i, t in toks.items()
    }
    top = Counter(g for gs in grams.values() for g in gs)
    ctx_top, tdist_top = Counter(), Counter()
    for g, c in top.items():
        ctx_top[g[:-1]] += c
        tdist_top[g[:-1]] += 1
    types = {n: set(top)}
    nc = {}
    for k in range(n - 1, 0, -1):
        nc[k] = Counter(g[-k:] for g in types[k + 1])
        types[k] = set(nc[k])
    denom, tdist = {}, {}
    for k in range(n - 1, 1, -1):
        denom[k], tdist[k] = Counter(), Counter()
        for s, c in nc[k].items():
            denom[k][s[:-1]] += c
            tdist[k][s[:-1]] += 1
    denom1, t1total = len(types[2]), len(types[1])
    vocab = {tok for t in toks.values() for tok in t}

    def p(g):
        pr = (
            max(nc[1].get(g[-1:], 0) - D, 0) / denom1
            + D * t1total / denom1 / len(vocab)
        )
        for k in range(2, n):
            m = g[-k:-1]
            pr = (
                max(nc[k].get(g[-k:], 0) - D, 0) / denom[k][m]
                + D * tdist[k][m] / denom[k][m] * pr
            )
        return (
            max(top.get(g, 0) - D, 0) / ctx_top[g[:-1]]
            + D * tdist_top[g[:-1]] / ctx_top[g[:-1]] * pr
        )

    return grams, p, ctx_top, vocab


def _ref_ngram_scores(docs: dict[int, str], n: int):
    grams, p, _, _ = _ref_ngram_model(docs, n)
    out = {}
    for i, gs in grams.items():
        lpq = [math.floor(math.log(p(g)) * 1e6) for g in gs]
        out[i] = (math.floor(sum(lpq) / len(lpq)) / 1e6, len(lpq))
    return out


def test_ngram_n3_bit_equal_to_trigram(spark):
    """Two independent implementations — the hand-rolled trigram and
    the generalized order-n recursion — must agree bit-for-bit."""
    from spdb_spark.functions.ngramlm import kn_ngram_logprob

    df = spark.createDataFrame(
        list(CORPUS.items()), "doc_id long, text string"
    )
    a = {
        r.doc_id: (r.mean_logprob, r.n_trigrams)
        for r in kn_trigram_logprob(df).collect()
    }
    b = {
        r.doc_id: (r.mean_logprob, r.n_ngrams)
        for r in kn_ngram_logprob(df, 3).collect()
    }
    assert a == b


def test_ngram_n4_matches_reference_exactly(spark):
    from spdb_spark.functions.ngramlm import kn_ngram_logprob

    df = spark.createDataFrame(
        list(CORPUS.items()), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.mean_logprob, r.n_ngrams)
        for r in kn_ngram_logprob(df, 4).collect()
    }
    assert got == _ref_ngram_scores(CORPUS, 4)


def test_ngram_n4_normalization_law():
    grams, p, ctx_top, vocab = _ref_ngram_model(CORPUS, 4)
    for ctx in ctx_top:
        total = sum(p(ctx + (w,)) for w in vocab)
        assert abs(total - 1.0) < 1e-9, (ctx, total)


def test_ngram_order_validation(spark):
    from spdb_spark.functions.ngramlm import kn_ngram_logprob

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        kn_ngram_logprob(df, 1)
    with pytest.raises(ValueError):
        kn_ngram_logprob(df, 9)


def test_discount_validation(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        kn_trigram_logprob(df, discount=0.0)
    with pytest.raises(ValueError):
        kn_trigram_logprob(df, discount=1.0)


def test_plan_shape(spark):
    df = spark.createDataFrame(
        list(CORPUS.items()), "doc_id long, text string"
    )
    plan = (
        kn_trigram_logprob(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan  # pure Column algebra
    assert "CartesianProduct" not in plan  # totals join is broadcast


def test_materialize_levels_dial_value_identical(spark):
    """The 100 TB level-materialization dial must not change a single
    output value or the set of checkpoint/broadcast hints reachable
    from the result: same rows for default (off), on, and on-without-
    broadcast-hints, for both the trigram and the order-5 forms."""
    from spdb_spark.functions.ngramlm import kn_ngram_logprob

    df = spark.createDataFrame(
        list(CORPUS.items()), "doc_id long, text string"
    )
    base3 = {
        r["doc_id"]: (r["mean_logprob"], r["n_trigrams"])
        for r in kn_trigram_logprob(df).collect()
    }
    for kwargs in (
        dict(materialize_levels=True),
        dict(materialize_levels=True, broadcast_levels=False),
    ):
        got = {
            r["doc_id"]: (r["mean_logprob"], r["n_trigrams"])
            for r in kn_trigram_logprob(df, **kwargs).collect()
        }
        assert got == base3, kwargs
    base5 = {
        r["doc_id"]: (r["mean_logprob"], r["n_ngrams"])
        for r in kn_ngram_logprob(df, 5).collect()
    }
    got5 = {
        r["doc_id"]: (r["mean_logprob"], r["n_ngrams"])
        for r in kn_ngram_logprob(df, 5, materialize_levels=True).collect()
    }
    assert got5 == base5


def test_frozen_model_levels_dial_value_identical(spark):
    """kn_model(materialize_levels=True) + kn_score must score exactly
    like the default-path model — the streaming scorer's posture."""
    from spdb_spark.functions.ngramlm import kn_model, kn_score

    df = spark.createDataFrame(
        list(CORPUS.items()), "doc_id long, text string"
    )
    train = df.where(F.col("doc_id") % 2 == 0)
    base = {
        r["doc_id"]: (r["mean_logprob"], r["n_trigrams"])
        for r in kn_score(df, kn_model(train)).collect()
    }
    got = {
        r["doc_id"]: (r["mean_logprob"], r["n_trigrams"])
        for r in kn_score(
            df, kn_model(train, materialize_levels=True)
        ).collect()
    }
    assert got == base
