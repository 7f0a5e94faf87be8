"""Frozen-model KN scoring (kn_model + kn_score) and the streaming
scorer: self-scoring bit-equality with kn_trigram_logprob, backoff
ladder semantics on unseen material, stream == batch, redelivery."""

import os

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.ngramlm import (
    kn_model,
    kn_score,
    kn_trigram_logprob,
)
from spdb_spark.streaming.ngramlm import StreamingKNScorer

TRAIN = {
    0: "the cat sat on the mat",
    1: "the cat sat on the hat",
    2: "the dog sat on the mat",
    3: "a dog ran to the park",
    4: "the cat ran to the park",
}
NEW = {
    10: "the cat sat on the mat",  # fully in-distribution
    11: "the cat sat on the moon",  # unseen word "moon"
    12: "the mat sat on the cat",  # seen words, unseen contexts
    13: "zebra quark sat on the mat",  # unseen words AND contexts
}


def _df(spark, d):
    return spark.createDataFrame(list(d.items()), "doc_id long, text string")


@pytest.fixture(scope="module")
def model(spark):
    return kn_model(_df(spark, TRAIN))


def test_self_scoring_bit_equal(spark, model):
    train = _df(spark, TRAIN)
    a = {
        r.doc_id: (r.mean_logprob, r.n_trigrams)
        for r in kn_trigram_logprob(train).collect()
    }
    b = {
        r.doc_id: (r.mean_logprob, r.n_trigrams)
        for r in kn_score(train, model).collect()
    }
    assert a == b


def _ref_frozen_scores(train, new_docs, alpha=0.4, D=0.75):
    """Independent plain-Python replica of kn_score's backoff ladder."""
    import math
    import re
    from collections import Counter, defaultdict

    toks = {
        i: re.split(r"\s+", t.strip().lower()) for i, t in train.items()
    }
    toks = {i: t for i, t in toks.items() if len(t) >= 3}
    tris = [
        (t[j], t[j + 1], t[j + 2])
        for t in toks.values()
        for j in range(len(t) - 2)
    ]
    c3 = Counter(tris)
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
    V = len({tok for t in toks.values() for tok in t})

    def p(u, v, w):
        p1 = (
            max(n1cont.get(w, 0) - D, 0) / n2types
            + D * t1 / n2types / V
        )
        if v in n2ctx:
            p2 = (
                max(cont2.get((v, w), 0) - D, 0) / n2ctx[v]
                + D * len(t2[v]) / n2ctx[v] * p1
            )
        else:
            p2 = alpha * p1
        if (u, v) in ctx:
            return (
                max(c3.get((u, v, w), 0) - D, 0) / ctx[(u, v)]
                + D * t3[(u, v)] / ctx[(u, v)] * p2
            )
        return alpha * p2

    out = {}
    for i, text in new_docs.items():
        t = re.split(r"\s+", text.strip().lower())
        if len(t) < 3:
            continue
        lpq = [
            math.floor(math.log(p(t[j], t[j + 1], t[j + 2])) * 1e6)
            for j in range(len(t) - 2)
        ]
        out[i] = (math.floor(sum(lpq) / len(lpq)) / 1e6, len(lpq))
    return out


def test_frozen_scores_match_reference_exactly(spark, model):
    """Exact value equality of the full backoff ladder (not just
    ranking) against the independent replica — including docs that
    drive the unseen-context alpha branches."""
    got = {
        r.doc_id: (r.mean_logprob, r.n_trigrams)
        for r in kn_score(_df(spark, NEW), model).collect()
    }
    assert got == _ref_frozen_scores(TRAIN, NEW)


def test_backoff_ladder_ranks_sensibly(spark, model):
    got = {
        r.doc_id: r.mean_logprob
        for r in kn_score(_df(spark, NEW), model).collect()
    }
    assert set(got) == set(NEW)
    # the in-distribution doc strictly outranks every perturbed one;
    # every score finite (11-vs-13 relative order is a function of the
    # alpha/discount constants, deliberately unasserted)
    for other in (11, 12, 13):
        assert got[10] > got[other], other
    assert all(s == s and s > float("-inf") for s in got.values())


def test_backoff_alpha_penalises_unseen_contexts(spark, model):
    """alpha < 1 must strictly lower all-novel-context docs vs the
    unpenalised ladder, and leave in-distribution docs untouched."""
    df = _df(spark, {10: NEW[10], 13: NEW[13]})
    pen = {r.doc_id: r.mean_logprob for r in kn_score(df, model).collect()}
    free = {
        r.doc_id: r.mean_logprob
        for r in kn_score(df, model, backoff_alpha=1.0).collect()
    }
    assert pen[13] < free[13]
    assert pen[10] == free[10]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        kn_score(df, model, backoff_alpha=0.0)


def test_unseen_material_strictly_positive_probability(spark, model):
    # A doc of entirely novel tokens still scores (uniform-base mass).
    df = _df(spark, {99: "aa bb cc dd"})
    rows = kn_score(df, model).collect()
    assert len(rows) == 1 and rows[0].n_trigrams == 2
    assert rows[0].mean_logprob > float("-inf")


def test_streaming_scorer_equals_batch(spark, tmp_path, model):
    src = str(tmp_path / "src")
    os.makedirs(src)
    items = sorted(NEW.items())
    for i, chunk in enumerate([items[:2], items[2:]]):
        _df(spark, dict(chunk)).coalesce(1).write.parquet(f"{src}/p{i}")

    sink = StreamingKNScorer(spark, str(tmp_path / "state"), model)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    q = sink.start(stream, str(tmp_path / "ckpt"), availableNow=True)
    assert q.awaitTermination(300), "KN scorer stream did not finish"

    got = {
        r.doc_id: (r.mean_logprob, r.n_trigrams)
        for r in sink.scores().collect()
    }
    want = {
        r.doc_id: (r.mean_logprob, r.n_trigrams)
        for r in kn_score(_df(spark, NEW), model).collect()
    }
    assert got == want


def test_streaming_redelivery_noop(spark, tmp_path, model):
    sink = StreamingKNScorer(spark, str(tmp_path / "state"), model)
    batch = _df(spark, NEW)
    sink.process_batch(batch, 0)
    assert sink.scores().count() == len(NEW)
    sink.process_batch(batch, 0)  # redelivered: no duplicate rows
    assert sink.scores().count() == len(NEW)


def test_reopen_rejects_different_model(spark, tmp_path, model):
    """The _params.json guard covers the frozen model's identity: a
    reopen of the same state path with a model trained on a different
    corpus must fail instead of appending incomparable scores."""
    import pytest

    from spdb_spark.functions.ngramlm import kn_model

    path = str(tmp_path / "state")
    StreamingKNScorer(spark, path, model)
    # same params, same model -> reopen OK
    StreamingKNScorer(spark, path, model)
    other = kn_model(
        _df(spark, {**NEW, 900: "a wholly different reference corpus "
                    "with new words entirely"})
    )
    with pytest.raises(ValueError, match="was built with"):
        StreamingKNScorer(spark, path, other)


def test_kn_ngram_frozen_n3_bit_equal_to_kn_score(spark, model):
    """The general-order frozen path at n=3 replays kn_score's backoff
    ladder bit-for-bit (same level shapes, same alpha) — including
    docs whose every trigram/context is unseen."""
    from spdb_spark.functions.ngramlm import kn_ngram_logprob, kn_ngram_model

    train, new = _df(spark, TRAIN), _df(spark, NEW)
    m3 = kn_ngram_model(train, 3)
    a = {
        r.doc_id: (r.mean_logprob, r.n_ngrams)
        for r in kn_ngram_logprob(new, 3, model=m3).collect()
    }
    b = {
        r.doc_id: (r.mean_logprob, r.n_trigrams)
        for r in kn_score(new, model).collect()
    }
    assert a == b
    assert set(a) == set(NEW)  # out-of-domain docs are NOT dropped


def test_kn_ngram_frozen_self_scoring_bit_equal(spark):
    """Scoring the training corpus through a prebuilt model hits every
    join, so the backoff branches never fire and the result equals the
    self-trained path exactly."""
    from spdb_spark.functions.ngramlm import kn_ngram_logprob, kn_ngram_model

    train = _df(spark, TRAIN)
    m4 = kn_ngram_model(train, 4)
    a = {
        r.doc_id: (r.mean_logprob, r.n_ngrams)
        for r in kn_ngram_logprob(train, 4, model=m4).collect()
    }
    b = {
        r.doc_id: (r.mean_logprob, r.n_ngrams)
        for r in kn_ngram_logprob(train, 4).collect()
    }
    assert a == b


def test_kn_ngram_frozen_ranks_out_of_domain_lowest(spark):
    """A frozen 5-gram quality filter must score the all-novel doc
    LOWEST, not lose it (the inner-join regression this pins against)."""
    from spdb_spark.functions.ngramlm import kn_ngram_logprob, kn_ngram_model

    train = _df(spark, TRAIN)
    new = _df(spark, NEW)
    m5 = kn_ngram_model(train, 5)
    got = {
        r.doc_id: r.mean_logprob
        for r in kn_ngram_logprob(new, 5, model=m5).collect()
    }
    assert set(got) == set(NEW)
    assert got[13] < got[10]  # all-unseen scores below in-distribution
    # the fully in-distribution doc ranks highest of the four
    assert got[10] == max(got.values())
