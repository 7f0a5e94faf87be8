"""Retrieval operator properties: cosine bounds, BM25 monotonicity in tf,
length normalization direction."""

from pyspark.sql import functions as F

from spdb_spark.functions.retrieval import bm25_scores, tfidf_cosine, tfidf_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_cosine_bounds_and_self_exclusion(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),       # exact dup of 1
            (3, "alpha beta delta"),
            (4, "epsilon zeta eta"),        # disjoint from 1
        ],
    )
    w = tfidf_weights(docs, "doc_id", "text")
    probes = docs.select(F.col("doc_id").alias("doc")).where(F.col("doc") == 1)
    sims = {r.doc_id: r.sim for r in tfidf_cosine(w, probes).collect()}
    assert 1 not in sims                      # probe never pairs with itself
    assert all(0.0 <= s <= 1.0 for s in sims.values())
    # identical doc maxes the score; sharing 2/3 terms beats disjoint
    if 2 in sims:
        assert sims[2] == max(sims.values())
    assert sims.get(4, 0.0) == 0.0 or 4 not in sims


def test_bm25_monotone_in_tf_and_length_normalized(spark):
    docs = _docs(
        spark,
        [
            (1, "scan alpha beta gamma"),
            (2, "scan scan alpha beta"),          # same length, higher tf
            (3, "scan alpha beta gamma delta epsilon zeta eta"),  # longer, same tf
        ],
    )
    scores = {r.doc_id: r.score for r in bm25_scores(docs, "doc_id", "text", ["scan"]).collect()}
    assert scores[2] > scores[1]   # more occurrences -> higher score
    assert scores[1] > scores[3]   # same tf in a longer doc -> lower score
    assert all(s >= 0 for s in scores.values())


class TestPassages:
    def test_windows_cover_tokens_with_overlap(self, spark):
        from spdb_spark.functions.retrieval import passages

        df = spark.createDataFrame(
            [("d", " ".join(f"w{i}" for i in range(20)))],
            "doc_id string, text string",
        )
        rows = sorted(
            passages(df, "doc_id", "text", window=8, stride=4).collect(),
            key=lambda r: r.idx,
        )
        # 1 + ceil((20-8)/4) = 4 windows, starts 0,4,8,12
        assert [r.idx for r in rows] == [0, 1, 2, 3]
        assert rows[0].passage.split() == [f"w{i}" for i in range(8)]
        assert rows[1].passage.split() == [f"w{i}" for i in range(4, 12)]
        assert rows[3].passage.split() == [f"w{i}" for i in range(12, 20)]

    def test_short_doc_yields_single_window(self, spark):
        from spdb_spark.functions.retrieval import passages

        df = spark.createDataFrame(
            [("d", "a b c")], "doc_id string, text string"
        )
        rows = passages(df, "doc_id", "text", window=8, stride=4).collect()
        assert len(rows) == 1 and rows[0].passage == "a b c"


class TestPersistedBM25Index:
    def test_indexed_search_equals_full_scan_bitwise(self, spark, tables, tmp_path):
        from spdb_spark.functions.retrieval import (
            bm25_scores,
            bm25_search_indexed,
            save_bm25_index,
        )

        docs = tables["documents"]
        terms = ("scan", "merge", "stream")
        path = str(tmp_path / "bm25")
        save_bm25_index(docs, "doc_id", "text", path)

        got = {
            r.doc_id: r.score
            for r in bm25_search_indexed(spark, path, terms).collect()
        }
        full = {
            r.doc_id: r.score
            for r in bm25_scores(docs, "doc_id", "text", terms).collect()
            if r.score > 0.0
        }
        assert got == full  # bit-identical fixed-order float expression

    def test_query_prunes_to_term_posting_lists(self, spark, tables, tmp_path):
        from spdb_spark.functions.retrieval import (
            bm25_search_indexed,
            save_bm25_index,
        )

        docs = tables["documents"]
        path = str(tmp_path / "bm25p")
        save_bm25_index(docs, "doc_id", "text", path)
        plan = (
            bm25_search_indexed(spark, path, ("scan", "merge"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters" in plan and "In(token" in plan

    def test_append_equals_rebuild(self, spark, tables, tmp_path):
        from pyspark.sql import functions as F

        from spdb_spark.functions.retrieval import (
            append_to_bm25_index,
            bm25_search_indexed,
            save_bm25_index,
        )

        docs = tables["documents"]
        terms = ("scan", "merge", "stream")
        first = docs.where(F.col("doc_id") % 2 == 0)
        rest = docs.where(F.col("doc_id") % 2 == 1)

        inc = str(tmp_path / "inc")
        save_bm25_index(first, "doc_id", "text", inc)
        append_to_bm25_index(rest, "doc_id", "text", inc)

        full = str(tmp_path / "full")
        save_bm25_index(docs, "doc_id", "text", full)

        a = {r.doc_id: r.score for r in bm25_search_indexed(spark, inc, terms).collect()}
        b = {r.doc_id: r.score for r in bm25_search_indexed(spark, full, terms).collect()}
        assert a == b


class TestBM25IndexRobustness:
    def test_query_term_colliding_with_layout_columns(self, spark, tmp_path):
        """ADVICE r4: a query term named like a layout column ("doc",
        "dl", "tf0") or containing dots must not break or silently
        mis-score — the pivoted df columns are positional now."""
        from spdb_spark.functions.retrieval import (
            bm25_scores,
            bm25_search_indexed,
            save_bm25_index,
        )

        docs = spark.createDataFrame(
            [
                (1, "doc dl scan tf0 n_docs"),
                (2, "doc doc merge sum_dl"),
                (3, "scan merge stream a.b"),
            ],
            "doc_id long, text string",
        )
        path = str(tmp_path / "bm25c")
        save_bm25_index(docs, "doc_id", "text", path)
        terms = ("doc", "dl", "tf0", "sum_dl", "a.b")
        got = {
            r.doc_id: r.score
            for r in bm25_search_indexed(spark, path, terms).collect()
        }
        full = {
            r.doc_id: r.score
            for r in bm25_scores(docs, "doc_id", "text", terms).collect()
            if r.score > 0.0
        }
        assert got == full

    def test_append_same_batch_id_is_idempotent(self, spark, tables, tmp_path):
        from pyspark.sql import functions as F

        from spdb_spark.functions.retrieval import (
            append_to_bm25_index,
            bm25_search_indexed,
            save_bm25_index,
        )

        docs = tables["documents"]
        terms = ("scan", "merge", "stream")
        first = docs.where(F.col("doc_id") % 2 == 0)
        rest = docs.where(F.col("doc_id") % 2 == 1)

        inc = str(tmp_path / "inc_idem")
        save_bm25_index(first, "doc_id", "text", inc)
        append_to_bm25_index(rest, "doc_id", "text", inc, batch_id="b1")
        # blind redelivery of the same batch: must be a no-op
        append_to_bm25_index(rest, "doc_id", "text", inc, batch_id="b1")

        full = str(tmp_path / "full_idem")
        save_bm25_index(docs, "doc_id", "text", full)
        a = {r.doc_id: r.score for r in bm25_search_indexed(spark, inc, terms).collect()}
        b = {r.doc_id: r.score for r in bm25_search_indexed(spark, full, terms).collect()}
        assert a == b

    def test_append_crash_mid_publish_recovers_on_retry(
        self, spark, tables, tmp_path, monkeypatch
    ):
        """ADVICE r4: kill the append between the tf copy and the df/stats
        publish — the retry with the same batch_id must converge to
        exactly the rebuilt index (no uncounted postings, no doubles)."""
        import shutil as _shutil

        from pyspark.sql import functions as F

        from spdb_spark.functions.retrieval import (
            append_to_bm25_index,
            bm25_search_indexed,
            save_bm25_index,
        )

        docs = tables["documents"]
        terms = ("scan", "merge", "stream")
        first = docs.where(F.col("doc_id") % 2 == 0)
        rest = docs.where(F.col("doc_id") % 2 == 1)

        inc = str(tmp_path / "inc_crash")
        save_bm25_index(first, "doc_id", "text", inc)

        real_copytree = _shutil.copytree
        calls = {"n": 0}

        def crashing_copytree(src, dst, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                raise OSError("injected crash mid-publish")
            return real_copytree(src, dst, **kw)

        # retrieval imports shutil inside the function; patch the module
        monkeypatch.setattr(_shutil, "copytree", crashing_copytree)
        try:
            append_to_bm25_index(rest, "doc_id", "text", inc, batch_id="b9")
            raised = False
        except OSError:
            raised = True
        assert raised  # the injected crash fired after the tf files landed
        # retry with the SAME batch_id: republish from sealed staging
        append_to_bm25_index(rest, "doc_id", "text", inc, batch_id="b9")

        full = str(tmp_path / "full_crash")
        save_bm25_index(docs, "doc_id", "text", full)
        a = {r.doc_id: r.score for r in bm25_search_indexed(spark, inc, terms).collect()}
        b = {r.doc_id: r.score for r in bm25_search_indexed(spark, full, terms).collect()}
        assert a == b

    def test_append_crash_mid_tf_copy_is_atomic(
        self, spark, tables, tmp_path, monkeypatch
    ):
        """ADVICE r5: kill the publish MID-TF-FILE-COPY — the partial copy
        must never be visible under the final name (it lands at a _-prefixed
        temp Spark ignores), so the same-batch retry re-copies instead of
        skipping a truncated parquet, and the index stays readable."""
        import os
        import shutil as _shutil

        from pyspark.sql import functions as F

        from spdb_spark.functions.retrieval import (
            append_to_bm25_index,
            bm25_search_indexed,
            save_bm25_index,
        )

        docs = tables["documents"]
        terms = ("scan", "merge", "stream")
        first = docs.where(F.col("doc_id") % 2 == 0)
        rest = docs.where(F.col("doc_id") % 2 == 1)

        inc = str(tmp_path / "inc_tfcrash")
        save_bm25_index(first, "doc_id", "text", inc)

        real_copyfile = _shutil.copyfile
        state = {"crashed": False}

        def crashing_copyfile(src, dst, **kw):
            # only sabotage tf publishes (staging writes go via Spark)
            if not state["crashed"] and os.sep + "tf" + os.sep in dst:
                state["crashed"] = True
                with open(dst, "wb") as f:
                    f.write(b"partial garbage")  # truncated copy
                raise OSError("injected crash mid-tf-copy")
            return real_copyfile(src, dst, **kw)

        monkeypatch.setattr(_shutil, "copyfile", crashing_copyfile)
        try:
            append_to_bm25_index(rest, "doc_id", "text", inc, batch_id="b7")
            raised = False
        except OSError:
            raised = True
        assert raised
        # no partial file visible under a final (non _/. prefixed) name
        tf_dir = os.path.join(inc, "tf")
        for fname in os.listdir(tf_dir):
            if fname.startswith(("a" + "b7-",)):
                raise AssertionError(f"partial publish visible: {fname}")
        # retry with the SAME batch_id converges to the rebuilt index
        append_to_bm25_index(rest, "doc_id", "text", inc, batch_id="b7")

        full = str(tmp_path / "full_tfcrash")
        save_bm25_index(docs, "doc_id", "text", full)
        a = {r.doc_id: r.score for r in bm25_search_indexed(spark, inc, terms).collect()}
        b = {r.doc_id: r.score for r in bm25_search_indexed(spark, full, terms).collect()}
        assert a == b

    def test_rebuild_over_appended_index_resets_protocol_state(
        self, spark, tables, tmp_path
    ):
        """ADVICE r5: save_bm25_index over a previously-appended path must
        reset the append protocol (_current.json, df_v*/stats_v*,
        _appendlog) — otherwise search resolves stale versioned df/stats
        against the fresh tf, and a replayed old batch_id silently no-ops
        and drops data."""
        import os

        from pyspark.sql import functions as F

        from spdb_spark.functions.retrieval import (
            append_to_bm25_index,
            bm25_search_indexed,
            save_bm25_index,
        )

        docs = tables["documents"]
        terms = ("scan", "merge", "stream")
        first = docs.where(F.col("doc_id") % 2 == 0)
        rest = docs.where(F.col("doc_id") % 2 == 1)

        path = str(tmp_path / "rebuilt")
        save_bm25_index(docs, "doc_id", "text", path)
        append_to_bm25_index(rest, "doc_id", "text", path, batch_id="b1")

        # rebuild from scratch over the same path
        save_bm25_index(first, "doc_id", "text", path)
        assert not os.path.exists(os.path.join(path, "_current.json"))
        assert not os.path.exists(os.path.join(path, "_appendlog"))
        assert not [e for e in os.listdir(path) if e.startswith("df_v")]

        # replaying the OLD batch id must actually apply, not no-op
        append_to_bm25_index(rest, "doc_id", "text", path, batch_id="b1")

        full = str(tmp_path / "full_rebuilt")
        save_bm25_index(docs, "doc_id", "text", full)
        a = {r.doc_id: r.score for r in bm25_search_indexed(spark, path, terms).collect()}
        b = {r.doc_id: r.score for r in bm25_search_indexed(spark, full, terms).collect()}
        assert a == b
