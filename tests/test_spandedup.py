"""Duplicate-span removal (functions/spandedup.py): cross- and
within-document span cuts, short-run survival, stride-recall trade,
and the no-token-explode plan shape."""

from pyspark.sql import functions as F

from spdb_spark.functions.spandedup import (
    duplicate_windows,
    remove_duplicate_spans,
)

SHARED = " ".join(f"shared{i}" for i in range(25))


def _docs(spark):
    rows = [
        (1, "alpha one " + " ".join(f"u1w{i}" for i in range(30))),
        (2, " ".join(f"u2w{i}" for i in range(10)) + " " + SHARED),
        (3, SHARED + " " + " ".join(f"u3w{i}" for i in range(12))),
        (4, " ".join(f"u4w{i}" for i in range(8))),  # short: untouched
        (5, SHARED + " middle marker words here " + SHARED),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_doc_spans_removed_uniques_survive(spark):
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicate_spans(
            _docs(spark), window=20, stride=5
        ).collect()
    }
    assert out[1][1] == 0 and out[4][1] == 0  # unique docs untouched
    assert "shared0" not in out[2][0] and "u2w0" in out[2][0]
    assert "shared0" not in out[3][0] and "u3w0" in out[3][0]
    assert out[2][1] == 25 and out[3][1] == 25  # exactly the shared run


def test_stride_one_catches_unaligned_within_doc_dup(spark):
    # with stride 5 the second within-doc occurrence sits off-grid and
    # survives; stride 1 (full exact-substring sensitivity) removes both
    docs = _docs(spark)
    coarse = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_spans(docs, window=20, stride=5).collect()
    }
    assert "shared1" in coarse[5]  # off-grid occurrence missed
    fine = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicate_spans(docs, window=20, stride=1).collect()
    }
    assert "shared1" not in fine[5]
    assert "marker" in fine[5][0]  # unique middle survives
    assert fine[5][1] == 50  # both 25-token occurrences cut


def test_whole_doc_duplicated_yields_empty(spark):
    docs = spark.createDataFrame(
        [(1, SHARED), (2, SHARED)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_spans(docs, window=20, stride=1).collect()
    }
    assert out == {1: "", 2: ""}


def test_duplicate_windows_counts_and_plan(spark):
    docs = _docs(spark)
    dups = duplicate_windows(docs, window=20, stride=1)
    assert dups.where(F.col("doc_id") == 1).count() == 0
    plan = (
        remove_duplicate_spans(docs, window=20, stride=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # the dup-hash filter is a semi join keyed on the window hash; the
    # corpus is never broadcast
    assert "LeftSemi" in plan


def test_keep_first_preserves_canonical_occurrence(spark):
    # Lee et al. repair semantics: the min-(doc_id, start) occurrence of
    # each duplicated window survives; every other occurrence is cut
    out = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_duplicate_spans(
            _docs(spark), window=20, stride=1, keep="first"
        ).collect()
    }
    # doc 2 carries the globally-first occurrence (doc_id 2 < 3 < 5):
    # its copy of SHARED survives intact
    assert "shared0" in out[2][0] and out[2][1] == 0
    # docs 3 and 5 lose their copies
    assert "shared0" not in out[3][0] and out[3][1] == 25
    assert "u3w0" in out[3][0]
    # doc 5 has TWO occurrences; both are non-canonical, both cut
    assert "shared0" not in out[5][0] and "marker" in out[5][0]
    assert out[5][1] == 50
    # unique docs untouched either way
    assert out[1][1] == 0 and out[4][1] == 0


def test_keep_first_within_doc_keeps_exactly_one(spark):
    # a single doc repeating a run: keep='first' keeps the EARLIEST copy
    docs = spark.createDataFrame(
        [(7, SHARED + " " + " ".join(f"mid{i}" for i in range(6)) + " " + SHARED)],
        "doc_id long, text string",
    )
    row = remove_duplicate_spans(docs, window=20, stride=1, keep="first").first()
    assert row["n_removed"] == 25
    assert row["clean_text"].startswith("shared0")
    assert row["clean_text"].count("shared0") == 1


def test_keep_validates(spark):
    import pytest

    with pytest.raises(ValueError, match="keep"):
        duplicate_windows(_docs(spark), keep="last")


def test_keep_first_invariants_on_random_corpora(spark):
    """Structural invariants on seeded random corpora: the keep-first
    removal set is the keep-none set minus EXACTLY the min-(doc_id,
    start) occurrence of each duplicated hash — so per-hash counts drop
    by one, the excluded row is the canonical one, and per-doc
    n_removed never increases."""
    import numpy as np

    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> many dup windows
    for trial in range(3):
        rows = [
            (d, " ".join(rng.choice(vocab, size=int(rng.integers(8, 40)))))
            for d in range(12)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        none_rows = {
            (r["doc_id"], r["start"], r["h"])
            for r in duplicate_windows(docs, window=5, stride=1).collect()
        }
        first_rows = {
            (r["doc_id"], r["start"], r["h"])
            for r in duplicate_windows(
                docs, window=5, stride=1, keep="first"
            ).collect()
        }
        assert first_rows <= none_rows
        by_hash_none: dict = {}
        for d, s, h in none_rows:
            by_hash_none.setdefault(h, []).append((d, s))
        by_hash_first: dict = {}
        for d, s, h in first_rows:
            by_hash_first.setdefault(h, []).append((d, s))
        for h, occs in by_hash_none.items():
            kept = set(occs) - set(by_hash_first.get(h, []))
            assert kept == {min(occs)}, (trial, h)
        n_none = {
            r["doc_id"]: r["n_removed"]
            for r in remove_duplicate_spans(docs, window=5, stride=1).collect()
        }
        n_first = {
            r["doc_id"]: r["n_removed"]
            for r in remove_duplicate_spans(
                docs, window=5, stride=1, keep="first"
            ).collect()
        }
        assert all(n_first[d] <= n_none[d] for d in n_none)
