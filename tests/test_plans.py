"""Physical-plan quality gates: the 100TB posture is only real if the plans
show it. Assert predicate pushdown into parquet scans, broadcast join
selection for dimension/id-list joins, and partial aggregation."""

import pytest
from pyspark.sql import functions as F

from spdb_spark.operators import voxel as V


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def voxel_parquet(spark, tmp_path_factory):
    from spdb_spark.fixtures import voxels_df

    path = str(tmp_path_factory.mktemp("vox") / "voxels.parquet")
    voxels_df(spark, "/root/testdata/sf0.001").write.parquet(path)
    return spark.read.parquet(path)


def test_cutout_pushes_box_predicate_to_scan(voxel_parquet):
    df = V.cutout(voxel_parquet, (256, 256, 8), (1024, 1024, 32))
    plan = plan_of(df)
    assert "PushedFilters" in plan
    # box bounds must reach the parquet scan (row-group min/max skipping)
    assert "GreaterThanOrEqual(x,256)" in plan and "LessThan(x,1280)" in plan


def test_id_filter_literal_list_stays_in_scan(voxel_parquet):
    df = V.id_filter(voxel_parquet, [5, 10, 15])
    plan = plan_of(df)
    assert "In(value, [" in plan  # literal IN pushed to the scan


def test_id_filter_dataframe_uses_broadcast_join(voxel_parquet, spark):
    ids = spark.createDataFrame([(5,), (10,)], "id long")
    df = V.id_filter(voxel_parquet, ids)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan


def test_q5_broadcasts_dimensions(spark):
    from spdb_spark.suite_relational import q5_region_revenue

    plan = plan_of(q5_region_revenue(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan


def test_downsample_uses_partial_aggregation(voxel_parquet):
    df = V.downsample_image_avg(voxel_parquet)
    plan = plan_of(df)
    # two HashAggregates (partial + final) around one shuffle
    assert plan.count("HashAggregate") >= 2
    assert "partial_avg" in plan or "partial" in plan


def test_anno_downsample_suite_entry_is_single_shuffle(spark):
    """The conditional-max corner pivot absorbs the fixture's MAX-dedup
    (duplicates of a voxel land in the same corner slot), so the suite
    entry must run ONE exchange — a second dedup shuffle would double
    the full-volume shuffle cost at any scale."""
    from spdb_spark.suite_spatial import q_spatial_downsample_anno

    plan = plan_of(q_spatial_downsample_anno(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange hashpartitioning") == 1


def test_whole_stage_codegen_covers_cutout(voxel_parquet):
    df = V.cutout(voxel_parquet, (0, 0, 0), (512, 512, 16))
    plan = plan_of(df)
    # '*(n)' marks WholeStageCodegen stages in the plan string
    assert "*(1)" in plan


def test_asof_join_avoids_range_cross_product(spark):
    """The as-of join must stay a union + one keyed shuffle — never a
    nested-loop/cartesian range join (quadratic under skew)."""
    from spdb_spark.suite_relational import q_asof_join

    plan = plan_of(q_asof_join(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan and "Union" in plan


def test_tfidf_idf_join_broadcasts(spark):
    from spdb_spark.functions.retrieval import tfidf_weights
    from spdb_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]
    plan = plan_of(tfidf_weights(docs, "doc_id", "text"))
    # vocabulary-sized idf table must broadcast, not shuffle the tf table
    assert "BroadcastHashJoin" in plan


def test_funnel_is_single_shuffle(spark):
    from spdb_spark.suite_relational import q_event_funnel

    plan = plan_of(q_event_funnel(spark, "/root/testdata/sf0.001"))
    # one shuffle for groupBy(user); the final 1-row agg is a single
    # partition exchange, never a join or per-step re-shuffle
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_stratified_sample_is_narrow(spark):
    from spdb_spark.functions.sampling import stratified_sample
    from spdb_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]
    plan = plan_of(stratified_sample(docs, "lang", {"en": 0.3}, "doc_id"))
    # pure filter over the scan: no exchange of any kind
    assert "Exchange" not in plan


def test_scd2_single_shuffle_shared_window_sort(spark):
    from spdb_spark.suite_relational import q_scd2_user_type

    plan = plan_of(q_scd2_user_type(spark, "/root/testdata/sf0.001"))
    # change-detect lag and valid_to lead share ONE (user_id) exchange and
    # ONE sort — Catalyst must not re-shuffle between the two windows
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan


def test_quality_filter_suite_broadcasts_drop_list(spark):
    from spdb_spark.suite_llm import q_quality_filter

    plan = plan_of(q_quality_filter(spark, "/root/testdata/sf0.001"))
    # the near-dup drop list joins broadcast; the rules never shuffle docs
    assert "BroadcastHashJoin" in plan


def test_repetition_stats_is_shuffle_free(spark):
    """Repetition metrics must run at scan speed: a narrow projection with
    no Exchange anywhere in the plan."""
    from spdb_spark.suite_llm import q_repetition

    plan = plan_of(q_repetition(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan


def test_pack_sequences_single_window_shuffle(spark):
    """Packing shuffles once to form the per-bucket windows; the stats agg
    reuses that partitioning (bucket is a prefix of the window key), so
    exactly one hash Exchange total."""
    from spdb_spark.suite_llm import q_pack_sequences

    plan = plan_of(q_pack_sequences(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange hashpartitioning") == 1


def test_pii_redact_is_shuffle_free(spark):
    from spdb_spark.suite_llm import q_pii_redact

    plan = plan_of(q_pii_redact(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan


def test_keep_best_single_shuffle_no_window(spark):
    """Canonical selection is one groupBy (partial agg map-side) — no
    window operator, no second Exchange."""
    from spdb_spark.suite_llm import q_dedup_keep_best

    plan = plan_of(q_dedup_keep_best(spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_min" in plan or "partial" in plan


def test_q17_stats_and_part_broadcast(spark):
    """q17's per-part stats and the part dim must both broadcast — the
    lineitem fact streams through without shuffling for the joins."""
    from spdb_spark.suite_relational import q17_small_qty_revenue

    plan = plan_of(q17_small_qty_revenue(spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_q21_two_exchanges_no_self_join(spark):
    """q21 compiles to pair-agg + per-order window — two hash exchanges on
    lineitem-derived data, no lineitem self-join (the reference TPC-H
    formulation needs exists + not-exists self-joins)."""
    from spdb_spark.suite_relational import q21_waiting_suppliers

    plan = plan_of(q21_waiting_suppliers(spark, "/root/testdata/sf0.001"))
    # orders + supplier joins broadcast; no sort-merge join anywhere
    assert "SortMergeJoin" not in plan
    assert "Window" in plan


def test_q22_anti_join_broadcasts(spark):
    from spdb_spark.suite_relational import q22_idle_customers

    plan = plan_of(q22_idle_customers(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan


def test_exact_substr_three_shuffles_max(spark):
    """Shared-gram coverage: gram doc-freq agg + back-join + per-doc
    re-agg — at most three hash exchanges, shared-gram side broadcast
    (boilerplate-sized), never a sort-merge join."""
    from spdb_spark.suite_llm import q_exact_substr

    plan = plan_of(q_exact_substr(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "SortMergeJoin" not in plan


def test_q18_join_broadcasts_after_aqe(spark):
    """q18's filtered-agg side is unknown-size at plan time; AQE must
    convert the orders join to broadcast at runtime (checked on the
    EXECUTED plan, after the action)."""
    from spdb_spark.suite_relational import q18_large_orders

    df = q18_large_orders(spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_scalar_stats_are_in_plan_not_eager_jobs(spark):
    """Corpus scalars (unigram total, tfidf/bm25 N) live INSIDE the plan
    (window / broadcast single-row branch); building the DataFrame must
    not launch eager full-scan jobs — at most the parquet reader's
    footer/schema probe per table. An eager docs.count() at build time
    was a whole extra scan+tokenize of documents per call."""
    from spdb_spark.suite_llm import (
        q_bm25_search,
        q_text_unigram_logprob,
        q_tfidf_similar,
    )

    sc = spark.sparkContext
    for fn in (q_text_unigram_logprob, q_tfidf_similar, q_bm25_search):
        group = f"lazy-{fn.__name__}"
        sc.setJobGroup(group, group)
        fn(spark, "/root/testdata/sf0.001")
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        sc.setJobGroup(None, None)
        assert len(jobs) <= 1, f"{fn.__name__} ran {len(jobs)} jobs at build"


def test_unigram_total_is_one_row_agg_not_window(spark):
    """The unigram-LM corpus total must be a 1-row global aggregate
    (map-side partials, broadcast crossJoin back) — never a
    single-partition Window over the vocab-sized freq table, which
    web-scale vocab (1e8+ distinct tokens) would break.
    llm_ccnet_buckets composes on this query and inherits the shape."""
    from spdb_spark.suite_llm import q_text_unigram_logprob

    plan = plan_of(q_text_unigram_logprob(spark, "/root/testdata/sf0.001"))
    assert "Window" not in plan
    # the only single-partition exchange feeds the scalar total, and its
    # input is the pre-aggregated partial sums, not vocab rows
    assert plan.count("Exchange SinglePartition") <= 1


def test_semantic_dedup_ships_lists_not_pairs(spark):
    """The semantic-dedup suite entry must keep the bucket-GEMM shape:
    lists grouped per centroid into an Arrow task (FlatMapGroupsInPandas),
    NO pair join anywhere — the pairwise forms (join + per-pair scoring)
    measured 4-12s vs ~1s at sf0.1."""
    from spdb_spark.suite_llm import q_dedup_semantic

    plan = plan_of(q_dedup_semantic(spark, "/root/testdata/sf0.001"))
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan


def test_union_merge_suite_entry_is_single_shuffle(spark):
    """The union-aggregate merge must run ONE exchange end-to-end (raw
    fixture -> tag union -> one groupBy); the join form pays three at
    scale (both sides' hash + the join)."""
    from spdb_spark.suite_spatial import q_spatial_overwrite_union

    plan = plan_of(q_spatial_overwrite_union(spark, "/root/testdata/sf0.001"))
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_paragraph_dedup_single_hash_keyed_exchange(spark):
    """The dedup stage's only corpus exchanges are keyed by the md5
    paragraph hash (stats agg + back-join); reassembly adds the two
    doc-keyed aggregates but NO window over the corpus."""
    from spdb_spark.functions import dedup as D
    from spdb_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]
    paras = D.word_chunk_paragraphs(docs, "doc_id", "text", 3)
    kept = D.paragraph_dedup(paras)
    out = D.reassemble_paragraph_docs(paras, kept)
    plan = plan_of(out)
    assert "Window" not in plan  # ordered concat is row-local array_sort
    dedup_plan = plan_of(kept)
    assert "hashpartitioning(ph" in dedup_plan  # stats keyed by the hash


def test_curation_pipeline_runs_triage_once(spark):
    """The curation pipeline checkpoints the chunked-paragraph table, so
    the upstream triage (quality verdicts + joins) runs exactly ONCE:
    the final plan reads the materialized paragraph RDD wherever the
    three consumers (dedup stats, dedup probe, reassembly) need it,
    instead of replaying the triage chain per consumer (38 parquet-scan
    subtrees before the r14 change, 2 after). Construction therefore
    runs the checkpoint's upstream stages — that work happens inside
    the gate call, which the bench times."""
    from spdb_spark.suite_llm import q_curation_pipeline

    df = q_curation_pipeline(spark, "/root/testdata/sf0.001")
    plan = plan_of(df)
    assert plan.count("ExistingRDD") >= 1  # the paragraph checkpoint
    # one residual documents scan for the lang join (+1 slack for AQE
    # formatting variance); the triage chain must NOT be replayed
    assert plan.count("Scan parquet") <= 3
    assert df.columns == ["split", "lang", "n_docs", "n_tokens"]


def test_passage_construction_adds_no_exchange(spark):
    """Chunking docs into overlapping passages is a narrow posexplode —
    the first exchange in passage-BM25 must be the per-passage token
    aggregate, never the chunking itself."""
    from spdb_spark.functions.retrieval import passages
    from spdb_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]
    plan = plan_of(passages(docs, "doc_id", "text"))
    assert "Exchange" not in plan


def test_iterative_cc_returns_truncated_plan(spark):
    """dup_clusters must hand consumers a scan-rooted plan, not the
    iteration join tower (a composition like dedup-survivors otherwise
    inherits thousands of plan nodes)."""
    from spdb_spark.functions.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    plan = plan_of(dup_clusters(pairs, max_iter=20))
    assert "Join" not in plan
    assert plan.count("\n") < 10


def test_closing_is_one_straight_line_pipeline(spark):
    """closing must be scan -> scatter -> dilate agg -> scatter -> erode
    agg: ONE input scan, exactly TWO position-keyed exchanges, no
    checkpoint RDD, no duplicated dilate subtree (the single-explode
    _scatter_union references its input once)."""
    from spdb_spark.fixtures import voxels_df
    from spdb_spark.operators.voxel import closing

    df = closing(voxels_df(spark, "/root/testdata/sf0.001"))
    plan = plan_of(df)
    assert "Scan ExistingRDD" not in plan  # no checkpoint needed anymore
    assert plan.count("Scan parquet") == 1  # dilate runs once, from one scan
    assert plan.count("Exchange hashpartitioning") == 2
    assert plan.count("Generate explode") == 2


def test_simhash_pairs_candidates_are_equi_join(spark):
    """Banded SimHash pair generation must be a band-keyed EQUI-join
    (broadcast or shuffled by (band, band_key)) — never a cartesian /
    nested-loop pair enumeration."""
    from spdb_spark.functions.dedup import simhash_neardup_pairs
    from spdb_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]
    plan = plan_of(simhash_neardup_pairs(docs, "doc_id", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_key" in plan  # the join really keys on the band bucket


def test_ann_filtered_query_prunes_and_pushes_down(spark, tmp_path):
    """The gated filtered-ANN query: centroid partition pruning AND the
    label predicate both reach the parquet scan of the lists."""
    import os
    import shutil

    from spdb_spark.suite_llm import _cache_dir, q_ann_filtered

    sf = "/root/testdata/sf0.001"
    shutil.rmtree(os.path.dirname(_cache_dir(sf, "ivf_label")), ignore_errors=True)
    plan = plan_of(q_ann_filtered(spark, sf))
    assert "PartitionFilters: [centroid_id" in plan or "centroid_id#" in plan
    assert "EqualTo(label,6)" in plan
    assert "CartesianProduct" not in plan


def test_capped_jaccard_plan_shape(spark):
    """The stop-shingle cap (r6, run by every gated pair query): the df
    filter is a partial-aggregated groupBy feeding a LEFT-SEMI join —
    map-side combine, streaming probe, AQE-splittable (the measured
    window alternative buffers the hot shingle's rows in one task and is
    rejected in the jaccard_pairs docstring). No cartesian products, and
    the doc<->shingle column order survives the USING join (the r6 bug)."""
    from spdb_spark.functions.dedup import jaccard_pairs, shingles
    from spdb_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]
    sh = shingles(docs, "doc_id", "text", k=3)
    # materialize=False exposes the full lineage to the plan assertions;
    # the default (True) checkpoints the capped shingle table, so the
    # cap subtree executes once but no longer appears in the final plan.
    df = jaccard_pairs(
        sh, "doc_id", threshold=0.5, max_doc_freq=100, materialize=False
    )
    plan = plan_of(df)
    assert "LeftSemi" in plan
    assert "partial_count" in plan  # df computed with map-side partials
    assert "CartesianProduct" not in plan
    assert [f.name for f in df.schema.fields] == ["id_a", "id_b", "jaccard"]


def test_capped_jaccard_default_materializes_shingles(spark):
    """The default (materialize=True) checkpoints the capped shingle table
    so its explode+distinct+cap chain runs ONCE instead of once per
    consumer (4 subtrees: both self-join sides + both size joins). The
    final plan therefore scans the checkpointed RDD, not parquet."""
    from spdb_spark.functions.dedup import jaccard_pairs, shingles
    from spdb_spark.session import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", names=("documents",))[
        "documents"
    ]
    sh = shingles(docs, "doc_id", "text", k=3)
    df = jaccard_pairs(sh, "doc_id", threshold=0.5, max_doc_freq=100)
    plan = plan_of(df)
    assert "ExistingRDD" in plan  # checkpointed shingle scan
    assert "parquet" not in plan.lower()  # source read exactly once, upstream
    # equivalence with the pure-lineage form on real data
    base = jaccard_pairs(
        sh, "doc_id", threshold=0.5, max_doc_freq=100, materialize=False
    )
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, base.collect()))
    assert got == want


def test_multimodal_decode_gate_plan(spark):
    """llm_multimodal_decode: two Arrow kernels (payload build + frame
    features), no shuffle anywhere — decode parallelism is pure scan
    parallelism."""
    from spdb_spark.suite_llm import q_multimodal_decode

    plan = plan_of(q_multimodal_decode(spark, "/root/testdata/sf0.001"))
    assert plan.count("MapInPandas") == 2
    assert "Exchange" not in plan


def test_multimodal_probe_gate_plan(spark):
    """llm_multimodal_probe: two Arrow kernels (payload build + header
    probe), no shuffle — prune-before-decode runs at scan parallelism."""
    from spdb_spark.suite_llm import q_multimodal_probe

    plan = plan_of(q_multimodal_probe(spark, "/root/testdata/sf0.001"))
    assert plan.count("MapInPandas") == 2
    assert "Exchange" not in plan


def test_crawl_suite_plan_shapes(spark):
    """The r9 crawl gates keep the posture rules: no row-at-a-time UDFs,
    no cartesian products; the crawl composition broadcasts its bounded
    sides, and the zip round-trip is exactly two Arrow stages (build
    kernel + member parse)."""
    from spdb_spark.suite_crawl import (
        q_crawl_corpus,
        q_domain_blocklist,
        q_warc_media_probe,
        q_zipshard_ingest,
    )

    sf = "/root/testdata/sf0.001"
    for fn in (q_crawl_corpus, q_domain_blocklist, q_warc_media_probe):
        plan = plan_of(fn(spark, sf))
        assert "BatchEvalPython" not in plan, fn.__name__
        assert "CartesianProduct" not in plan, fn.__name__

    zplan = plan_of(q_zipshard_ingest(spark, sf))
    assert "BatchEvalPython" not in zplan
    assert zplan.count("FlatMapGroupsInPandas") == 1  # zip build kernel
    assert zplan.count("MapInPandas") == 1  # member parse kernel

    # blocklist: corpus side never exchanged on doc keys — every hash
    # exchange belongs to the distinct-host subtree
    import re

    bplan = plan_of(q_domain_blocklist(spark, sf))
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", bplan):
        assert "doc_id" not in m.group(1), bplan


def test_pq_adc_plan_shapes(spark):
    """PQ/IVF-PQ posture: no row-at-a-time UDFs, no cartesian products;
    the PQ candidate scan broadcasts the query side (BNLJ of a tiny
    broadcast — intended, like brute force), and the IVF-PQ candidate
    stage arrives through a centroid_id BROADCAST HASH join, never a
    nested loop over the corpus."""
    from pyspark.sql import functions as F

    from spdb_spark.functions.pq import ivfpq_topk, pq_topk
    from spdb_spark.session import load_tables

    embs = load_tables(spark, "/root/testdata/sf0.001", names=("embeddings",))[
        "embeddings"
    ]
    queries = embs.where(F.col("vec_id") % 50 == 0)

    pq_plan = plan_of(pq_topk(embs, queries, dim=64, k=5, rerank=10))
    assert "BatchEvalPython" not in pq_plan
    assert "CartesianProduct" not in pq_plan
    assert "BroadcastExchange" in pq_plan  # query side broadcast

    ivfpq_plan = plan_of(
        ivfpq_topk(embs, queries, dim=64, k=5, n_centroids=8, n_probe=2, rerank=10)
    )
    assert "BatchEvalPython" not in ivfpq_plan
    assert "CartesianProduct" not in ivfpq_plan
    # the ADC stage joins codes to probes on centroid_id as a broadcast
    # hash join (the probe table is query-count x n_probe rows)
    assert "BroadcastHashJoin" in ivfpq_plan


def test_streaming_crawl_corpus_reader_plan(spark, tmp_path):
    """corpus() posture: the canonicalization is one min-struct
    aggregate (partial map-side), pairs/losers resolve through hash
    joins — no cartesian products, no row-UDFs, no window over the
    corpus."""
    from spdb_spark.streaming.crawl import StreamingCrawlCorpus

    sink = StreamingCrawlCorpus(spark, str(tmp_path / "state"), quality=False)
    batch = spark.createDataFrame(
        [
            (i, f"text body number {i} with several words", "en",
             f"http://h{i % 3}.example/p{i}", 30)
            for i in range(30)
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    sink.process_batch(batch, 0)
    plan = plan_of(sink.corpus())
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan or "partial" in plan  # min-struct agg
    assert "Window" not in plan


def test_tokenizer_seed_topk_is_take_ordered_not_window(spark):
    """The seed-vocab top-K ranks the multi-char substring-TYPE table —
    hundreds of millions of rows at web scale. It must compile to
    TakeOrderedAndProject (per-partition heap + K-row merge), never an
    unpartitioned row_number window (single-partition sort of the whole
    type table)."""
    from spdb_spark.functions.unigram import unigram_seed_vocab, word_freqs
    from spdb_spark.functions.wordpiece import wordpiece_seed_vocab

    docs = spark.createDataFrame(
        [(i, f"banana bandana word{i % 7}") for i in range(50)],
        "doc_id long, text string",
    )
    words = word_freqs(docs)
    for seed in (
        unigram_seed_vocab(words, max_piece_len=3, keep_top=5),
        wordpiece_seed_vocab(words, max_piece_len=3, keep_top=5),
    ):
        plan = plan_of(seed)
        assert "Window" not in plan
        assert "TakeOrderedAndProject" in plan
