"""Incremental minhash dedup (new batch vs corpus index) must find exactly
the cross pairs the full self-pairing pipeline finds."""

from pyspark.sql import functions as F

from spdb_spark.functions.dedup import (
    band_buckets,
    incremental_minhash_dedup,
    minhash_lsh_dedup,
    minhash_signatures,
    shingles,
)
from spdb_spark.session import load_tables

SPLIT = 400


def _docs(spark):
    return load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]


def test_incremental_matches_full_cross_pairs(spark):
    docs = _docs(spark)
    corpus = docs.where(F.col("doc_id") < SPLIT)
    new = docs.where(F.col("doc_id") >= SPLIT)

    full = minhash_lsh_dedup(docs, "doc_id", "text")
    cross = {
        (r.id_a, r.id_b): r.jaccard
        for r in full.collect()
        if r.id_a < SPLIT <= r.id_b
    }

    inc = incremental_minhash_dedup(new, corpus, "doc_id", "text")
    got = {(r.corpus_id, r.new_id): r.jaccard for r in inc.collect()}

    assert got == cross
    assert len(got) > 0  # the fixture corpus does contain cross dups


def test_incremental_accepts_persisted_index(spark, tmp_path):
    docs = _docs(spark)
    corpus = docs.where(F.col("doc_id") < SPLIT)
    new = docs.where(F.col("doc_id") >= SPLIT)

    idx_path = str(tmp_path / "band_index")
    sh = shingles(corpus, "doc_id", "text", distinct=False)
    band_buckets(minhash_signatures(sh, "doc_id")).write.parquet(idx_path)
    idx = spark.read.parquet(idx_path)

    a = sorted(
        map(tuple, incremental_minhash_dedup(new, corpus, "doc_id", "text").collect())
    )
    b = sorted(
        map(
            tuple,
            incremental_minhash_dedup(
                new, corpus, "doc_id", "text", corpus_bands=idx
            ).collect(),
        )
    )
    assert a == b


def test_shuffle_verify_equals_broadcast_verify(spark):
    """The 100 TB verify form (shuffled joins on the flat (doc, shingle)
    table) must produce the identical verified pair set as the broadcast
    set-intersect form."""
    from spdb_spark.functions.dedup import minhash_lsh_dedup
    from spdb_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.01", names=("documents",))[
        "documents"
    ]
    kw = dict(k=3, num_hashes=16, bands=8, rows=2, threshold=0.2)
    bc = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in minhash_lsh_dedup(docs, "doc_id", "text", **kw).collect()
    }
    sh = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in minhash_lsh_dedup(
            docs, "doc_id", "text", verify="shuffle", **kw
        ).collect()
    }
    assert bc == sh
    assert bc  # non-trivial fixture


def test_materialized_equals_pure_lineage(spark):
    """The `materialize` dial (doc-sized signature/shingle-set
    checkpoints, the 100 TB corpus-pass saver) must be plan-only: the
    verified pair set is identical with and without it, in both verify
    forms."""
    from spdb_spark.functions.dedup import minhash_lsh_dedup
    from spdb_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]
    kw = dict(k=3, num_hashes=16, bands=8, rows=2, threshold=0.2)
    for verify in ("broadcast", "shuffle"):
        plain = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in minhash_lsh_dedup(
                docs, "doc_id", "text", verify=verify, **kw
            ).collect()
        }
        mat = {
            (r.id_a, r.id_b): round(r.jaccard, 9)
            for r in minhash_lsh_dedup(
                docs, "doc_id", "text", verify=verify, materialize=True, **kw
            ).collect()
        }
        assert plain == mat
        assert plain  # non-trivial fixture


class TestIncrementalClusters:
    def test_incremental_equals_full_recompute(self, spark):
        """Chaining batches of pairs through incremental_dup_clusters
        must give exactly the labels of one full dup_clusters run on the
        union — including batches that MERGE previously separate
        clusters."""
        import random

        from pyspark.sql import functions as F

        from spdb_spark.functions.dedup import dup_clusters, incremental_dup_clusters

        rng = random.Random(7)
        ids = list(range(200))
        pairs = [
            (min(a, b), max(a, b))
            for a, b in (
                (rng.choice(ids), rng.choice(ids)) for _ in range(220)
            )
            if a != b
        ]
        half = len(pairs) // 2
        df = lambda rows: spark.createDataFrame(rows, "id_a long, id_b long")  # noqa: E731

        full = {
            (r.id, r.cluster_id)
            for r in dup_clusters(df(pairs)).collect()
        }
        base = dup_clusters(df(pairs[:half]))
        inc = {
            (r.id, r.cluster_id)
            for r in incremental_dup_clusters(base, df(pairs[half:])).collect()
        }
        assert inc == full

    def test_batch_that_bridges_two_clusters(self, spark):
        from spdb_spark.functions.dedup import dup_clusters, incremental_dup_clusters

        df = lambda rows: spark.createDataFrame(rows, "id_a long, id_b long")  # noqa: E731
        base = dup_clusters(df([(1, 2), (2, 3), (10, 11)]))
        got = {
            (r.id, r.cluster_id)
            for r in incremental_dup_clusters(base, df([(3, 10)])).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (10, 1), (11, 1)}


def test_minhash_verify_mode_policy(spark):
    """r5 'What's wrong #2': verify-mode selection derives from the
    corpus-size hint; no hint must resolve scale-safe (shuffle), never
    a corpus-sized broadcast."""
    from spdb_spark.functions.dedup import (
        _VERIFY_BROADCAST_MAX_DOCS,
        minhash_lsh_dedup,
        minhash_verify_mode,
    )

    assert minhash_verify_mode(500) == "broadcast"
    assert minhash_verify_mode(_VERIFY_BROADCAST_MAX_DOCS) == "broadcast"
    assert minhash_verify_mode(_VERIFY_BROADCAST_MAX_DOCS + 1) == "shuffle"
    assert minhash_verify_mode(None) == "shuffle"

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta word{i} tail{i%3}") for i in range(30)],
        "doc_id long, text string",
    )
    # auto + small hint -> broadcast verify (array_intersect in the plan)
    plan_b = minhash_lsh_dedup(
        docs, "doc_id", "text", n_docs=30
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "array_intersect" in plan_b
    # auto + huge hint (and no hint) -> shuffle verify, no set broadcast
    for hint in (10_000_000, None):
        plan_s = minhash_lsh_dedup(
            docs, "doc_id", "text", n_docs=hint
        )._jdf.queryExecution().optimizedPlan().toString()
        assert "array_intersect" not in plan_s

    # both resolutions produce identical pairs (the existing equivalence,
    # re-pinned through the auto path)
    a = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in minhash_lsh_dedup(docs, "doc_id", "text", n_docs=30).collect()
    )
    b = sorted(
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in minhash_lsh_dedup(docs, "doc_id", "text", n_docs=None).collect()
    )
    assert a == b
