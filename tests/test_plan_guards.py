"""Regression net for the r14 expression-duplication fixes.

Three silent per-row duplication mechanisms were found and fixed in
round 14 (OPTIMIZATION_r14.md); each fix depends on specific optimizer
behavior that a Spark minor bump could change with ZERO correctness
signal — only a 2x cost regression. These tests pin the fixed plan
shapes:

1. `session.where_above` (filter-pushdown re-expansion): the guard
   works only while (a) pushdown requires every PROJECT field to be
   deterministic and (b) an attribute-read rand disjunct is not
   range-folded. If either changes, the hot Filters silently re-inline
   the expensive extraction chains.
2. Staged projections (multi-consumed interpreted arrays): survive only
   while CollapseProject keeps its multi-reference cost guard
   (collapseProjectAlwaysInline=false default).
3. `_bind_once` struct outputs (c4_page_flags): field extractions above
   a separate projection must not collapse back into per-field
   re-evaluation of the whole flags body.
"""

from pyspark.sql import functions as F


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _filter_lines(plan: str) -> list[str]:
    return [ln for ln in plan.split("\n") if "Filter" in ln]


def _load_docs(spark):
    from spdb_spark.session import load_tables

    return load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]


def test_span_window_length_gate_reads_projected_tokens(spark):
    """duplicate_windows: the length gate must read the projected token
    array (`size(_t) >= w OR _no_pushdown < -1`), never re-run the
    whitespace split inside the Filter — pushdown re-expansion doubled
    the tokenize cost of BOTH window passes before r14."""
    from spdb_spark.functions.spandedup import duplicate_windows

    plan = _executed(duplicate_windows(_load_docs(spark), "doc_id", "text"))
    fls = _filter_lines(plan)
    assert any("_no_pushdown" in ln for ln in fls), plan
    assert not any("split(" in ln for ln in fls), fls


def test_docs_from_pages_emptiness_gate_reads_projected_text(spark):
    """docs_from_pages: the emptiness test must read the projected text
    attribute; pushed below the projection it re-runs the whole
    main-text extraction (regexp_replace chain) inside the Filter."""
    from spdb_spark.suite_crawl import q_crawl_corpus

    plan = _executed(q_crawl_corpus(spark, "/root/testdata/sf0.001"))
    fls = _filter_lines(plan)
    assert not any("regexp_replace(" in ln for ln in fls), fls


def test_semantic_pairs_tau_gate_reads_projected_cosine(spark):
    """semantic_dedup_pairs (pair-join kernel): the tau gate must read
    the projected cos_sim, never re-run the 64-term aggregate/zip_with
    cosine fold inside the Filter (it would double the per-candidate
    score cost — the hot loop of this form)."""
    from spdb_spark.functions.ivf import semantic_dedup_pairs
    from spdb_spark.session import load_tables

    embs = load_tables(
        spark, "/root/testdata/sf0.001", names=("embeddings",)
    )["embeddings"]
    pairs = semantic_dedup_pairs(
        embs, "vec_id", "embedding", tau=0.45, k=8, kernel="fold"
    )
    fls = _filter_lines(_executed(pairs))
    assert any("_no_pushdown" in ln for ln in fls)
    assert not any("aggregate(" in ln or "zip_with(" in ln for ln in fls), fls


def test_repetition_ngram_array_staged_once(spark):
    """repetition_stats: the interpreted n-gram transform and the token
    split must each appear ONCE in the plan — CollapseProject inlining
    them back would re-run the build per reference (size +
    array_distinct = 2x per row)."""
    from spdb_spark.suite_llm import q_repetition

    plan = _executed(q_repetition(spark, "/root/testdata/sf0.001"))
    assert plan.count("transform(") == 1, plan
    assert plan.count("split(") == 1, plan


def test_c4_flags_struct_not_inlined_per_field(spark):
    """llm_c4_rules extracts 5 fields from the c4_page_flags struct in a
    projection ABOVE the struct's own projection; if CollapseProject
    inlined the struct per field, the whole line-filter lambda would run
    once per extracted field. The struct body's distinctive aggregate
    (the kept-words sum over filtered lines) must appear exactly once."""
    from spdb_spark.suite import REGISTRY

    fn, _sql = REGISTRY["llm_c4_rules"]
    plan = _executed(fn(spark, "/root/testdata/sf0.001"))
    # every field must be read OFF THE STRUCT ATTRIBUTE (s#N.kept_lines
    # AS ...) — an inlined plan recomputes the field from `page` and has
    # no attribute access
    for field in ("kept_lines", "kept_words", "n_sentences",
                  "has_lorem", "has_brace"):
        assert plan.count(f".{field} AS") == 1, (field, plan)
    # and the page line-split family runs once per c4 call (clean/flags/
    # keep = 9 splits total on this Spark version), never once per
    # extracted field (inlining would add >= 1 split per field)
    assert plan.count("split(") <= 9, plan.count("split(")


def test_where_above_guard_survives_with_conflicting_column(spark):
    """where_above must not clobber (or drop) a pre-existing caller
    column named _no_pushdown — the guard uniquifies its tag."""
    from spdb_spark.session import where_above

    df = spark.range(10).select(
        F.col("id"), F.lit(1.0).alias("_no_pushdown")
    )
    out = where_above(df, F.col("id") >= 5)
    assert "_no_pushdown" in out.columns
    rows = out.collect()
    assert len(rows) == 5 and all(r["_no_pushdown"] == 1.0 for r in rows)


_PROBE_GROUP_SEQ = iter(range(10**9))


def _jobs_run(spark, fn):
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    # a dedicated, NEVER-REUSED group name: id(fn) collided when a freed
    # closure's address was reallocated, double-counting the prior run
    group = f"probe-count-{next(_PROBE_GROUP_SEQ)}"
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(tracker.getJobIdsForGroup(group) or [])


def test_dup_clusters_probe_batching_cuts_jobs(spark):
    """The convergence probe is a driver-synchronized job per round;
    probe_every=2 must launch measurably fewer jobs than probe_every=1
    on a long chain (the r14 scaling block measured the iterative gates
    ANTI-scaling 8->32 cores on exactly this serialization), while
    returning identical labels."""
    from spdb_spark.functions.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )

    def run(k):
        out = {}

        def go():
            out["rows"] = sorted(
                map(tuple, dup_clusters(pairs, max_iter=30, probe_every=k).collect())
            )

        out["jobs"] = _jobs_run(spark, go)
        return out

    every = run(1)
    batched = run(2)
    assert batched["rows"] == every["rows"]
    assert batched["jobs"] < every["jobs"], (batched["jobs"], every["jobs"])


def test_connected_components_probe_batching_cuts_jobs(spark):
    """Same contract for the voxel CC loop: fewer driver-synchronized
    jobs at probe_every=2, identical components."""
    from spdb_spark.operators.voxel import connected_components

    # a 1-voxel-wide diagonal-free line: diameter = length, worst case
    rows = [(0, x, 0, 0, 1) for x in range(24)]
    v = spark.createDataFrame(rows, "t int, x long, y long, z long, value int")

    def run(k):
        out = {}

        def go():
            out["rows"] = sorted(
                map(
                    tuple,
                    connected_components(v, max_iter=30, probe_every=k).collect(),
                )
            )

        out["jobs"] = _jobs_run(spark, go)
        return out

    every = run(1)
    batched = run(3)
    assert batched["rows"] == every["rows"]
    assert batched["jobs"] < every["jobs"], (batched["jobs"], every["jobs"])
