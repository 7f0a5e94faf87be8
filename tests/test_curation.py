"""Unit tests for the curation operators added beyond the oracle gates:
sequence packing invariants, repetition metrics on crafted docs, PII
redaction spans, keep-best tie-breaking, mixture-plan rates."""

import pytest
from pyspark.sql import functions as F

from spdb_spark.functions import packing as PK
from spdb_spark.functions import sampling as SP
from spdb_spark.functions import text as T
from spdb_spark.functions.dedup import keep_best


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestPackSequences:
    def test_every_doc_assigned_and_offsets_partition_budget(self, spark):
        df = _docs_df(
            spark, [(i, "w " * (5 + i % 37)) for i in range(200)]
        ).select("doc_id", T.token_count(F.col("text")).alias("tok"))
        packed = PK.pack_sequences(df, "doc_id", "tok", budget=50, n_buckets=8)
        rows = packed.collect()
        assert len(rows) == 200
        for r in rows:
            # a doc is assigned to the sequence its start offset falls in
            assert r.seq_id == r.seq_offset // 50
            assert 0 <= r.bucket < 8

    def test_assignment_invariant_to_partitioning(self, spark):
        df = _docs_df(
            spark, [(i, "w " * (3 + i % 11)) for i in range(100)]
        ).select("doc_id", T.token_count(F.col("text")).alias("tok"))
        a = {
            r.doc_id: (r.bucket, r.seq_id)
            for r in PK.pack_sequences(df, "doc_id", "tok", 40).collect()
        }
        b = {
            r.doc_id: (r.bucket, r.seq_id)
            for r in PK.pack_sequences(
                df.repartition(13), "doc_id", "tok", 40
            ).collect()
        }
        assert a == b

    def test_sequence_stats_cover_all_tokens(self, spark):
        df = _docs_df(
            spark, [(i, "w " * (1 + i % 7)) for i in range(64)]
        ).select("doc_id", T.token_count(F.col("text")).alias("tok"))
        total = df.agg(F.sum("tok")).collect()[0][0]
        packed = PK.pack_sequences(df, "doc_id", "tok", 30)
        stats = PK.sequence_stats(packed, "tok").collect()
        assert sum(r.seq_tokens for r in stats) == total
        assert sum(r.n_docs for r in stats) == 64


class TestRepetitionStats:
    def test_crafted_fractions(self, spark):
        df = _docs_df(
            spark,
            [
                (1, "a b c d e f"),          # all distinct
                (2, "a b a b a b"),          # 2 distinct of 6 tokens
                (3, "x y"),                  # too short for trigrams
                (4, "a a a a"),              # one distinct token & trigram
            ],
        )
        out = {r.doc_id: r for r in T.repetition_stats(df, "doc_id", "text").collect()}
        assert out[1].dup_token_frac == 0.0
        assert out[1].dup_ngram_frac == 0.0
        # 1 - 2/6 = 0.666666 floor-scaled
        assert out[2].dup_token_frac == pytest.approx(0.666666)
        # trigrams of doc2: 4 total, 2 distinct ("a b a", "b a b")
        assert out[2].n_ngrams == 4
        assert out[2].dup_ngram_frac == pytest.approx(0.5)
        assert out[3].n_ngrams == 0
        assert out[3].dup_ngram_frac == 0.0
        assert out[4].dup_token_frac == pytest.approx(0.75)
        assert out[4].dup_ngram_frac == pytest.approx(0.5)


class TestRedactPii:
    def test_spans_replaced_and_counted(self, spark):
        df = spark.createDataFrame(
            [(1, "mail a.b+c@ex-ample.org or 192.168.0.1 or +44-123-4567-890 end")],
            "id long, s string",
        )
        row = df.select(
            T.redact_pii(F.col("s")).alias("red"), *T.pii_counts(F.col("s"))
        ).collect()[0]
        assert row.red == "mail <EMAIL> or <IP> or <PHONE> end"
        assert (row.n_email, row.n_ipv4, row.n_phone) == (1, 1, 1)

    def test_clean_text_untouched(self, spark):
        df = spark.createDataFrame([(1, "no pii here at all")], "id long, s string")
        row = df.select(T.redact_pii(F.col("s")).alias("red")).collect()[0]
        assert row.red == "no pii here at all"


class TestKeepBest:
    def test_keeps_highest_quality_then_smallest_id(self, spark):
        df = spark.createDataFrame(
            [
                # group 1: same token set, doc 11 longer -> kept
                (10, "alpha beta", 9),
                (11, "beta alpha alpha", 16),
                # group 2: tie on quality -> smallest id kept
                (20, "gamma delta", 11),
                (21, "delta gamma", 11),
                # singleton: not reported
                (30, "unique words here", 17),
            ],
            "doc_id long, text string, n_chars int",
        )
        out = {r.keep_id: r for r in keep_best(df, "doc_id", "text", "n_chars").collect()}
        assert set(out) == {11, 20}
        assert out[11].n_docs == 2 and out[11].n_dropped == 1


class TestMixturePlan:
    def test_uniform_target_rates(self, spark):
        df = spark.createDataFrame(
            [("a", 100), ("a", 100), ("b", 50), ("c", 25), ("c", 25)],
            "source string, tok long",
        )
        out = {r.domain: r for r in SP.mixture_plan(df, "source", "tok").collect()}
        # total 300, 3 domains -> target 100 tokens each
        assert out["a"].rate_ppm == 500000      # 100/200
        assert out["b"].rate_ppm == 1000000     # capped at 1.0
        assert out["c"].rate_ppm == 1000000     # 100/50 capped
        assert out["a"].actual_share == pytest.approx(0.666666)


class TestSharedNgramCoverage:
    def test_crafted_overlap(self, spark):
        from spdb_spark.functions.dedup import shared_ngram_coverage

        df = _docs_df(
            spark,
            [
                (1, "p q r s t u v w"),        # shares "p q r s t" prefix with 2
                (2, "p q r s t x y z"),
                (3, "totally different words entirely here now"),
            ],
        )
        out = {
            r.doc_id: r
            for r in shared_ngram_coverage(df, "doc_id", "text", k=5).collect()
        }
        assert set(out) == {1, 2}
        # doc1 has 4 grams, exactly 1 ("p q r s t") shared
        assert out[1].n_grams == 4 and out[1].n_shared == 1
        assert out[1].shared_frac == pytest.approx(0.25)

    def test_short_docs_excluded(self, spark):
        from spdb_spark.functions.dedup import shared_ngram_coverage

        df = _docs_df(spark, [(1, "a b"), (2, "a b")])
        assert shared_ngram_coverage(df, "doc_id", "text", k=5).count() == 0


class TestBpePairs:
    def test_counts_and_order(self, spark):
        from spdb_spark.functions.text import bpe_pair_counts

        df = _docs_df(spark, [(1, "a b a b c"), (2, "a b")])
        rows = bpe_pair_counts(df, "text", top_n=2).collect()
        assert [(r.pair, r.n) for r in rows] == [("a b", 3), ("b a", 1)]


class TestApproxVocab:
    def test_estimate_within_hll_error_of_exact(self, spark):
        """Pins the RAW HLL estimate against the exact distinct count (the
        gate query q_approx_vocab now emits only the tolerance flag)."""
        from spdb_spark.session import load_tables
        from spdb_spark.functions.text import tokens

        sf = "/root/testdata/sf0.001"
        docs = load_tables(spark, sf, names=("documents",))["documents"]
        toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        est, exact = toks.agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("tok", 12)),
            F.count_distinct("tok"),
        ).collect()[0]
        # lgK=12 -> relative standard error ~1.6%; allow 5 sigma
        assert abs(est - exact) / exact < 0.08

    def test_gate_query_reports_within_tolerance(self, spark):
        from spdb_spark.suite_llm import q_approx_vocab

        rows = q_approx_vocab(spark, "/root/testdata/sf0.001").collect()
        assert rows and all(r.within_tol == 1 for r in rows)
        assert {r.lang for r in rows} >= {"ALL"}


class TestSemanticDedup:
    def test_subset_of_exact_pairs_with_bounded_recall(self, spark):
        from spdb_spark.session import load_tables
        from spdb_spark.functions.ivf import semantic_dedup_pairs
        from spdb_spark.suite_llm import q_dedup_embedding, _COS_TAU

        sf = "/root/testdata/sf0.01"
        exact = {
            (r.id_a, r.id_b): r.cos_sim
            for r in q_dedup_embedding(spark, sf).collect()
        }
        embs = load_tables(spark, sf, names=("embeddings",))["embeddings"]
        got = {
            (r.id_a, r.id_b): r.cos_sim
            for r in semantic_dedup_pairs(
                embs, "vec_id", "embedding", tau=_COS_TAU, n_rows=embs.count()
            ).collect()
        }
        # precision 1.0: every bucketed pair is re-scored exactly, so it
        # must appear in the baseline with the identical rounded score
        for pair, sim in got.items():
            assert exact.get(pair) == sim
        # recall: bucket misses only, measured 0.86 on these fixtures
        assert len(got) / len(exact) >= 0.8

    def test_suite_config_holds_recall_at_sf01(self, spark):
        """The exact config the sf0.1 bench entry runs (q_dedup_semantic,
        calibrated k=16) must hold the recall bar at that corpus size too
        — auto-k without probe co-scaling measured only 0.60 here, which
        is why the suite entry pins k."""
        from spdb_spark.suite_llm import q_dedup_embedding, q_dedup_semantic

        sf = "/root/testdata/sf0.1"
        exact = {
            (r.id_a, r.id_b) for r in q_dedup_embedding(spark, sf).collect()
        }
        got = {
            (r.id_a, r.id_b) for r in q_dedup_semantic(spark, sf).collect()
        }
        assert got <= exact  # precision 1.0
        assert len(got) / len(exact) >= 0.8  # measured 0.847 (k=16, p=3)

    def test_plan_build_launches_no_job(self, spark):
        """Constructing the semantic-dedup plan must not run a Spark job
        (the old auto-k path fired a full corpus.count() at build time —
        an extra 100 TB scan before any action). Tagged job group: any
        job launched during build would land in it."""
        from spdb_spark.session import load_tables
        from spdb_spark.functions.ivf import auto_k, semantic_dedup_pairs

        embs = load_tables(spark, "/root/testdata/sf0.001", names=("embeddings",))[
            "embeddings"
        ]
        sc = spark.sparkContext
        sc.setJobGroup("semantic-dedup-build", "plan construction only")
        try:
            df = semantic_dedup_pairs(
                embs, "vec_id", "embedding", tau=0.9, n_rows=1024
            )
            df_arrow = semantic_dedup_pairs(
                embs, "vec_id", "embedding", tau=0.9, k=auto_k(1024),
                kernel="arrow",
            )
        finally:
            sc.setJobGroup("", "")
        tracker = sc.statusTracker()
        assert tracker.getJobIdsForGroup("semantic-dedup-build") == []
        assert df.schema.fieldNames() == ["id_a", "id_b", "cos_sim"]
        assert df_arrow.schema.fieldNames() == ["id_a", "id_b", "cos_sim"]

    def test_blocked_gemm_equals_fold_scores(self, spark):
        """The Arrow kernel's row-block strips (bounded task memory) must
        produce byte-identical pairs+scores to the Catalyst fold: force
        multi-strip execution with a tiny block so every strip boundary
        is exercised (sf0.001 buckets would otherwise fit one strip)."""
        from spdb_spark.session import load_tables
        from spdb_spark.functions.ivf import semantic_dedup_pairs

        embs = load_tables(spark, "/root/testdata/sf0.001", names=("embeddings",))[
            "embeddings"
        ]
        fold = {
            (r.id_a, r.id_b): r.cos_sim
            for r in semantic_dedup_pairs(
                embs, "vec_id", "embedding", tau=0.45, k=8
            ).collect()
        }
        blocked = {
            (r.id_a, r.id_b): r.cos_sim
            for r in semantic_dedup_pairs(
                embs, "vec_id", "embedding", tau=0.45, k=8,
                kernel="arrow", gemm_block_rows=7,
            ).collect()
        }
        assert blocked == fold

    def test_auto_k_requires_caller_count(self, spark):
        from spdb_spark.session import load_tables
        from spdb_spark.functions.ivf import semantic_dedup_pairs

        embs = load_tables(spark, "/root/testdata/sf0.001", names=("embeddings",))[
            "embeddings"
        ]
        with pytest.raises(ValueError, match="pass k, n_rows, or cents"):
            semantic_dedup_pairs(embs, "vec_id", "embedding")


class TestParagraphDedup:
    """Real paragraph semantics (structural '\\n\\n' splits) — the suite
    gate exercises the word-chunk unit on the delimiter-free fixture."""

    def _paras(self, spark, rows):
        from spdb_spark.functions import dedup as D

        df = spark.createDataFrame(rows, "doc_id string, text string")
        return D.paragraphs(df, "doc_id", "text")

    def test_duplicated_paragraph_kept_once_at_first_occurrence(self, spark):
        from spdb_spark.functions import dedup as D

        paras = self._paras(
            spark,
            [
                ("a", "unique alpha\n\nBOILERPLATE\n\nunique beta"),
                ("b", "BOILERPLATE\n\nunique gamma"),
                ("c", "unique delta\n\nBOILERPLATE"),
            ],
        )
        kept = D.paragraph_dedup(paras, min_df=2).collect()
        boiler = [(r.doc, r.idx) for r in kept if r.para == "BOILERPLATE"]
        assert boiler == [("a", 1)]  # min (doc, idx) occurrence only
        assert len(kept) == 5  # 4 uniques + 1 canonical boilerplate

    def test_keep_first_false_drops_all_occurrences(self, spark):
        from spdb_spark.functions import dedup as D

        paras = self._paras(
            spark, [("a", "dup\n\nx"), ("b", "dup\n\ny"), ("c", "dup\n\nz")]
        )
        kept = D.paragraph_dedup(paras, min_df=2, keep_first=False).collect()
        assert sorted(r.para for r in kept) == ["x", "y", "z"]

    def test_reassembly_preserves_order_and_empties_fully_dup_doc(self, spark):
        from spdb_spark.functions import dedup as D

        paras = self._paras(
            spark,
            [
                ("a", "p1\n\nSHARED\n\np3"),
                ("b", "SHARED"),  # only paragraph is a non-canonical dup
            ],
        )
        kept = D.paragraph_dedup(paras, min_df=2)
        out = {
            r.doc: r
            for r in D.reassemble_paragraph_docs(paras, kept, sep="\n\n").collect()
        }
        assert out["a"].clean_text == "p1\n\nSHARED\n\np3"
        assert (out["a"].n_paras, out["a"].n_kept) == (3, 3)
        assert out["b"].clean_text == ""
        assert (out["b"].n_paras, out["b"].n_kept) == (1, 0)

    def test_word_chunk_unit_covers_every_token_in_order(self, spark):
        from spdb_spark.functions import dedup as D

        df = spark.createDataFrame(
            [("d", " ".join(f"w{i}" for i in range(23)),)],
            "doc_id string, text string",
        )
        rows = sorted(
            D.word_chunk_paragraphs(df, "doc_id", "text", chunk_words=10).collect(),
            key=lambda r: r.idx,
        )
        assert [r.idx for r in rows] == [0, 1, 2]
        assert " ".join(r.para for r in rows) == " ".join(
            f"w{i}" for i in range(23)
        )


class TestDeterministicShuffle:
    def test_positions_are_the_exact_global_hash_rank(self, spark):
        df = spark.createDataFrame(
            [(f"doc{i:04d}",) for i in range(777)], "doc_id string"
        )
        out = SP.deterministic_shuffle(df, "doc_id", seed="s1")
        rows = out.collect()
        assert sorted(r.position for r in rows) == list(range(1, 778))
        by_key = sorted(rows, key=lambda r: (r.shuffle_key, r.doc_id))
        assert [r.position for r in by_key] == list(range(1, 778))

    def test_invariant_under_input_partitioning_and_seed_changes_order(self, spark):
        df = spark.createDataFrame(
            [(f"doc{i:04d}",) for i in range(300)], "doc_id string"
        )
        a = {
            r.doc_id: r.position
            for r in SP.deterministic_shuffle(df, "doc_id", seed="s1").collect()
        }
        b = {
            r.doc_id: r.position
            for r in SP.deterministic_shuffle(
                df.repartition(13), "doc_id", seed="s1"
            ).collect()
        }
        c = {
            r.doc_id: r.position
            for r in SP.deterministic_shuffle(df, "doc_id", seed="s2").collect()
        }
        assert a == b
        assert a != c

    def test_corpus_window_is_bucket_partitioned(self, spark):
        """The only non-partitioned window must be the 256-row offsets
        table, never the corpus: the corpus-side window carries the
        _bucket partition spec."""
        df = spark.createDataFrame(
            [(f"doc{i:04d}",) for i in range(100)], "doc_id string"
        )
        plan = (
            SP.deterministic_shuffle(df, "doc_id")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        corpus_windows = [
            ln
            for ln in plan.splitlines()
            if "row_number" in ln and "windowspecdefinition" in ln
        ]
        assert corpus_windows and all("_bucket" in ln for ln in corpus_windows)


def test_paragraph_provenance_points_at_canonical_copy(spark):
    from spdb_spark.functions import dedup as D

    df = spark.createDataFrame(
        [
            ("a", "unique alpha\n\nBOILER\n\nbeta"),
            ("b", "BOILER\n\ngamma"),
            ("c", "delta\n\nBOILER"),
        ],
        "doc_id string, text string",
    )
    paras = D.paragraphs(df, "doc_id", "text")
    prov = {
        (r.doc, r.idx): (r.canonical_doc, r.canonical_idx)
        for r in D.paragraph_provenance(paras).collect()
    }
    # the two non-canonical BOILER occurrences both point at ("a", 1)
    assert prov == {("b", 0): ("a", 1), ("c", 1): ("a", 1)}
    # provenance rows are exactly the dedup's dropped occurrences
    kept = D.paragraph_dedup(paras)
    dropped = paras.select("doc", "idx").subtract(kept.select("doc", "idx"))
    assert {(r.doc, r.idx) for r in dropped.collect()} == set(prov)


class TestTrainBpeMerges:
    @staticmethod
    def _reference(texts, n_merges, min_count=2):
        """Pure-Python mirror: greedy left-to-right merges, ties broken
        (count DESC, a ASC, b ASC)."""
        docs = [t.strip().lower().split() for t in texts]
        merges = []
        for step in range(n_merges):
            counts = {}
            for toks in docs:
                for i in range(len(toks) - 1):
                    counts[(toks[i], toks[i + 1])] = (
                        counts.get((toks[i], toks[i + 1]), 0) + 1
                    )
            if not counts:
                break
            (a, b), n = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            if n < min_count:
                break
            merges.append((step, a, b, n))
            new_docs = []
            for toks in docs:
                out = []
                for x in toks:
                    if out and out[-1] == a and x == b:
                        out[-1] = f"{a} {b}"
                    else:
                        out.append(x)
                new_docs.append(out)
            docs = new_docs
        return merges

    def test_matches_python_reference_through_checkpoint_rounds(self, spark):
        from spdb_spark.functions.text import train_bpe_merges

        texts = [
            "the quick brown fox jumps over the quick brown dog",
            "the quick brown fox sleeps",
            "a quick brown fox is quick",
            "the the the quick quick brown",
        ] * 3
        df = spark.createDataFrame([(t,) for t in texts], "text string")
        got = train_bpe_merges(df, "text", n_merges=8)
        assert got == self._reference(texts, 8)
        assert len(got) >= 4  # enough rounds to cross a checkpoint boundary

    def test_greedy_nonoverlapping_run_merge(self, spark):
        from spdb_spark.functions.text import train_bpe_merges

        # "x x x x" (run of 4) -> pair (x,x) counted 3 times, but greedy
        # left-to-right merging yields ["x x", "x x"], and the next round
        # merges those
        df = spark.createDataFrame([("x x x x",)] * 2, "text string")
        got = train_bpe_merges(df, "text", n_merges=2)
        assert got == self._reference(["x x x x"] * 2, 2)
        assert got[0][1:3] == ("x", "x")
        assert got[1][1:3] == ("x x", "x x")

    def test_apply_merges_both_engines_equal_reference(self, spark):
        from spdb_spark.functions.text import apply_bpe_merges, train_bpe_merges

        texts = [
            "the quick brown fox jumps over the quick brown dog",
            "the quick brown fox sleeps",
            "a quick brown fox is quick",
        ] * 2
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        merges = train_bpe_merges(df, "text", n_merges=6)

        def ref_encode(text):
            toks = text.strip().lower().split()
            for _, a, b, _ in merges:
                res = []
                for x in toks:
                    if res and res[-1] == a and x == b:
                        res[-1] = f"{a} {b}"
                    else:
                        res.append(x)
                toks = res
            return toks

        expected = {i: ref_encode(t) for i, t in enumerate(texts)}
        for engine in ("arrow", "column"):
            got = {
                r.doc_id: list(r.bpe_tokens)
                for r in apply_bpe_merges(
                    df, "doc_id", "text", merges, engine=engine
                ).collect()
            }
            assert got == expected, engine


def test_deterministic_shuffle_positions_invariant_to_bucket_width(spark):
    """prefix_chars sizes the enumeration buckets (256 at 2 hex chars;
    at 100 TB you raise it so a bucket fits one window partition) — the
    POSITIONS must not depend on it."""
    df = spark.createDataFrame(
        [(f"doc{i:04d}",) for i in range(400)], "doc_id string"
    )
    base = {
        r.doc_id: r.position
        for r in SP.deterministic_shuffle(df, "doc_id", prefix_chars=2).collect()
    }
    for pc in (1, 3):
        got = {
            r.doc_id: r.position
            for r in SP.deterministic_shuffle(
                df, "doc_id", prefix_chars=pc
            ).collect()
        }
        assert got == base, pc


def test_apply_bpe_merges_engines_agree_on_null_and_empty_text(spark):
    """ADVICE r4: the arrow engine must replicate tokens() semantics —
    empty/whitespace text yields [''], null text yields null — instead of
    str()-coercing (which produced [] and the literal token 'none')."""
    from spdb_spark.functions.text import apply_bpe_merges

    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None), (3, "a b a b")],
        "doc_id long, text string",
    )
    merges = [("a", "b")]
    col = {
        r.doc_id: r.bpe_tokens
        for r in apply_bpe_merges(df, "doc_id", "text", merges, engine="column").collect()
    }
    arw = {
        r.doc_id: r.bpe_tokens
        for r in apply_bpe_merges(df, "doc_id", "text", merges, engine="arrow").collect()
    }
    assert col == arw
    assert arw[0] == [""] and arw[1] == [""]
    assert arw[2] is None
    assert arw[3] == ["a b", "a b"]


class TestSimhashPairs:
    def test_exact_recall_within_pigeonhole_bound(self, spark, tables):
        """bands=4, max_hamming=3: pigeonhole guarantees EVERY pair with
        Hamming distance <= 3 shares a band — the banded join must find
        exactly the brute-force pair set, with exact distances."""
        from spdb_spark.functions.dedup import simhash_neardup_pairs
        from spdb_spark.functions.text import simhash

        docs = tables["documents"].limit(120)
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_neardup_pairs(
                docs, "doc_id", "text", bits=32, bands=4, max_hamming=3
            ).collect()
        }
        sigs = {r.doc_id: r.simhash for r in simhash(docs, "doc_id", "text", 32).collect()}
        ids = sorted(sigs)
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = bin(sigs[a] ^ sigs[b]).count("1")
                if h <= 3:
                    want[(a, b)] = h
        assert got == want

    def test_bands_must_divide_bits(self, spark, tables):
        import pytest

        from spdb_spark.functions.dedup import simhash_neardup_pairs

        with pytest.raises(ValueError):
            simhash_neardup_pairs(tables["documents"], "doc_id", "text", bits=32, bands=5)


def test_normalize_text_semantics(spark):
    from spdb_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [(1, "Hello,   World!!"), (2, "  a-b_c  "), (3, ""), (4, "123 GO")],
        "id long, s string",
    )
    got = {r.id: r.n for r in df.select("id", normalize_text(F.col("s")).alias("n")).collect()}
    assert got == {1: "hello world", 2: "a b c", 3: "", 4: "123 go"}


def test_containment_catches_partial_copy_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment_a = 1.0
    while Jaccard stays below a typical threshold."""
    from spdb_spark.functions.dedup import containment_pairs, jaccard_pairs, shingles

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(12))
    df = _docs_df(spark, [(1, short), (2, long)])
    sh = shingles(df, "doc_id", "text", k=3)
    (pair,) = containment_pairs(sh, "doc_id", threshold=0.9).collect()
    assert (pair.id_a, pair.id_b) == (1, 2)
    assert pair.containment_a == 1.0 and pair.containment_b < 0.2
    assert jaccard_pairs(sh, "doc_id", threshold=0.5).count() == 0


def test_knn_classify_majority_and_tiebreak(spark):
    import numpy as np

    from spdb_spark.functions.similarity import knn_classify

    rng = np.random.default_rng(5)
    # two well-separated clusters with labels 0 and 1; a query near each
    rows = []
    for i in range(20):
        base = np.zeros(8)
        base[0 if i < 10 else 1] = 10.0
        rows.append((i, (base + rng.normal(0, 0.1, 8)).tolist(), 0 if i < 10 else 1))
    rows.append((100, [10.0] + [0.0] * 7, -1))
    rows.append((101, [0.0, 10.0] + [0.0] * 6, -1))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    corpus = df.where(F.col("vec_id") < 100)
    queries = df.where(F.col("vec_id") >= 100)
    got = {
        r.query_id: (r.pred_label, r.votes)
        for r in knn_classify(corpus, queries, "vec_id", "embedding", "label", k=5).collect()
    }
    assert got == {100: (0, 5), 101: (1, 5)}

    # tie at k=2 between labels from the two clusters is impossible here;
    # craft an exact tie: two neighbors each of labels 3 and 7
    tie = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 7),
            (2, [0.98, 0.2], 7),
            (3, [1.0, 0.01], 3),
            (4, [0.97, 0.24], 3),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    q = spark.createDataFrame([(9, [1.0, 0.1])], "vec_id long, embedding array<double>")
    (r,) = knn_classify(tie, q.withColumn("label", F.lit(-1)), "vec_id", "embedding", "label", k=4).collect()
    assert r.pred_label == 3 and r.votes == 2  # tie -> smallest label


def test_knn_classify_string_labels_tiebreak(spark):
    """ADVICE r5: the old struct-max argmax negated the label, which
    null-casts non-numeric labels and made ties nondeterministic; the
    row_number form must tie-break toward the lexicographically smallest
    string label."""
    from pyspark.sql import functions as F

    from spdb_spark.functions.similarity import knn_classify

    tie = spark.createDataFrame(
        [
            (1, [1.0, 0.0], "zebra"),
            (2, [0.98, 0.2], "zebra"),
            (3, [1.0, 0.01], "aardvark"),
            (4, [0.97, 0.24], "aardvark"),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    q = spark.createDataFrame([(9, [1.0, 0.1])], "vec_id long, embedding array<double>")
    (r,) = knn_classify(
        tie, q.withColumn("label", F.lit("x")), "vec_id", "embedding", "label", k=4
    ).collect()
    assert r.pred_label == "aardvark" and r.votes == 2


def test_simhash_64bit_signature_and_pairs(spark):
    """bits=64 (the corpus-scale configuration, 16-bit bands): bit 63
    lives in the long sign bit via two's complement; banding must still
    bucket equal band-bits together and Hamming must stay exact."""
    from spdb_spark.functions.dedup import simhash_neardup_pairs
    from spdb_spark.functions.text import simhash

    # single-token docs: bit 63 of the signature is exactly bit 3 of the
    # token's high-half hash, so ~half the signatures go negative
    df = _docs_df(
        spark,
        [(i, f"alpha beta gamma delta w{i % 3}") for i in range(30)]
        + [(100 + i, f"solo{i}") for i in range(16)],
    )
    sigs = {r.doc_id: r.simhash for r in simhash(df, "doc_id", "text", 64).collect()}
    assert any(s < 0 for s in sigs.values())  # bit 63 exercised

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_neardup_pairs(
            df, "doc_id", "text", bits=64, bands=4, max_hamming=3
        ).collect()
    }
    ids = sorted(sigs)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                want[(a, b)] = h
    assert got == want and got  # non-empty: w{i%3} families collide


def test_max_doc_freq_cap_semantics_and_equivalence(spark):
    """r5 'What's wrong #1': the stop-shingle cap had zero tests (and was
    in fact broken — the USING semi-join reordered columns under the
    positional toDF rename, swapping doc<->shingle). Pin:
    (a) capped results == brute-force Jaccard over the capped shingle
        universe (sizes recomputed post-cap),
    (b) on a corpus where the cap removes only an all-docs boilerplate
        shingle set, the qualifying PAIR SET is unchanged (near-dups keep
        qualifying, unrelated docs stay below threshold),
    (c) a permissive cap (>= ndocs) is exactly the uncapped result."""
    from pyspark.sql import functions as F

    from spdb_spark.functions.dedup import jaccard_pairs, containment_pairs, shingles

    # 3 near-dup pairs + 4 unrelated docs; every doc shares one boilerplate
    # sentence ("copyright footer text here") -> its shingles have df=10
    boiler = "copyright footer text here"
    rows = []
    for i, (a, b) in enumerate([(0, 1), (2, 3), (4, 5)]):
        body = f"alpha{i} beta{i} gamma{i} delta{i} eps{i} zeta{i} eta{i}"
        rows.append((a, f"{body} {boiler}"))
        rows.append((b, f"{body} extra{i} {boiler}"))
    for j in range(6, 10):
        rows.append((j, f"unique{j} words{j} only{j} appear{j} once{j} {boiler}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = shingles(docs, "doc_id", "text", k=3)

    # brute force over the capped universe
    rows_sh = [(r.doc_id, r.shingle) for r in sh.collect()]
    from collections import Counter, defaultdict

    df_count = Counter(s for _, s in rows_sh)
    for cap in (3, 100):
        kept = {s for s, c in df_count.items() if c <= cap}
        sets = defaultdict(set)
        for d, s in rows_sh:
            if s in kept:
                sets[d].add(s)
        want = {}
        ids = sorted(sets)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                A, B = sets[ids[x]], sets[ids[y]]
                inter = len(A & B)
                if inter and inter / len(A | B) >= 0.5:
                    want[(ids[x], ids[y])] = round(inter / len(A | B), 9)
        got = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in jaccard_pairs(sh, "doc_id", threshold=0.5, max_doc_freq=cap).collect()
        }
        assert got == want, f"cap={cap}"

    uncapped = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(sh, "doc_id", threshold=0.5).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(sh, "doc_id", threshold=0.5, max_doc_freq=3).collect()
    }
    assert capped == uncapped == {(0, 1), (2, 3), (4, 5)}  # (b)

    # (c) permissive cap is bitwise the uncapped result
    perm = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(sh, "doc_id", threshold=0.5, max_doc_freq=1000).collect()
    }
    base = {
        (r.id_a, r.id_b, r.jaccard)
        for r in jaccard_pairs(sh, "doc_id", threshold=0.5).collect()
    }
    assert perm == base

    # containment: same column-order hazard, same capped-universe contract
    got_c = {
        (r.id_a, r.id_b): (round(r.containment_a, 9), round(r.containment_b, 9))
        for r in containment_pairs(sh, "doc_id", threshold=0.5, max_doc_freq=3).collect()
    }
    kept3 = {s for s, c in df_count.items() if c <= 3}
    sets3 = defaultdict(set)
    for d, s in rows_sh:
        if s in kept3:
            sets3[d].add(s)
    want_c = {}
    ids = sorted(sets3)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            A, B = sets3[ids[x]], sets3[ids[y]]
            inter = len(A & B)
            if inter and (inter / len(A) >= 0.5 or inter / len(B) >= 0.5):
                want_c[(ids[x], ids[y])] = (
                    round(inter / len(A), 9),
                    round(inter / len(B), 9),
                )
    assert got_c == want_c
