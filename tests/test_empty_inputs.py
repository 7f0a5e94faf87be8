"""Degenerate-input robustness: the major pipelines must return empty (or
correctly-typed) results on empty/trivial inputs rather than erroring —
at 100 TB an empty partition, a drained channel, or a first-run index is
the common case, not the exception."""

import numpy as np
from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_embs(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<double>")


def test_minhash_on_empty_corpus(spark):
    from spdb_spark.functions.dedup import minhash_lsh_dedup

    out = minhash_lsh_dedup(_empty_docs(spark), "doc_id", "text")
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "jaccard"]


def test_minhash_single_doc_no_pairs(spark):
    from spdb_spark.functions.dedup import minhash_lsh_dedup

    docs = spark.createDataFrame([(1, "hello world foo")], "doc_id long, text string")
    assert minhash_lsh_dedup(docs, "doc_id", "text").count() == 0


def test_ivf_topk_on_empty_corpus(spark):
    from spdb_spark.functions.ivf import ivf_topk

    out = ivf_topk(_empty_embs(spark), _empty_embs(spark), k=3)
    assert out.count() == 0


def test_semantic_dedup_on_empty_corpus(spark):
    from spdb_spark.functions.ivf import semantic_dedup_pairs

    for kernel in ("fold", "arrow"):
        out = semantic_dedup_pairs(
            _empty_embs(spark), "vec_id", "embedding", k=4, kernel=kernel
        )
        assert out.count() == 0


def test_quantize_empty(spark):
    from spdb_spark.functions.quantize import quantize_embeddings

    assert quantize_embeddings(_empty_embs(spark)).count() == 0


def test_brute_force_topk_empty_queries(spark, tables):
    from spdb_spark.functions.similarity import brute_force_topk

    out = brute_force_topk(tables["embeddings"], _empty_embs(spark), k=3)
    assert out.count() == 0


def test_store_cutout_on_empty_store(spark, tmp_path):
    from spdb_spark.store import CuboidStore

    st = CuboidStore(spark, str(tmp_path / "blocks"), datatype="uint8")
    out = st.cutout((0, 0, 0), (64, 64, 8))
    assert out.shape == (1, 8, 64, 64)
    assert out.sum() == 0


def test_dup_clusters_no_pairs(spark):
    from spdb_spark.functions.dedup import dup_clusters

    pairs = spark.createDataFrame([], "id_a long, id_b long, jaccard double")
    assert dup_clusters(pairs).count() == 0


def test_text_stats_empty_and_whitespace_docs(spark):
    from spdb_spark.functions.text import lang_id, quality_score, token_count

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\n\t")], "doc_id long, text string"
    )
    rows = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tok"),
        quality_score(F.col("text")).alias("q"),
        lang_id(F.col("text")).alias("lang"),
    ).collect()
    assert len(rows) == 3
    for r in rows:
        # documented cross-engine quirk: trim strips only spaces and
        # split('') = [''] in Spark AND DuckDB, so empty/whitespace
        # text counts >=1 pseudo-tokens — never a divide-by-zero
        # downstream, and identical in both engines
        assert r.n_tok >= 1
        assert r.q == r.q and 0.0 <= r.q <= 1.0  # finite, bounded
        assert r.lang == "und"


def test_paragraph_dedup_on_empty_corpus(spark):
    from spdb_spark.functions import dedup as D

    paras = D.word_chunk_paragraphs(_empty_docs(spark), "doc_id", "text")
    kept = D.paragraph_dedup(paras)
    out = D.reassemble_paragraph_docs(paras, kept)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "doc", "clean_text", "n_paras", "n_kept",
    ]


def test_deterministic_shuffle_empty_and_singleton(spark):
    from spdb_spark.functions import sampling as SP

    assert SP.deterministic_shuffle(_empty_docs(spark), "doc_id").count() == 0
    one = spark.createDataFrame([(7, "x")], "doc_id long, text string")
    rows = SP.deterministic_shuffle(one, "doc_id").collect()
    assert len(rows) == 1 and rows[0].position == 1


def test_simhash_pairs_empty_and_single_doc(spark):
    from spdb_spark.functions.dedup import simhash_neardup_pairs

    out = simhash_neardup_pairs(_empty_docs(spark), "doc_id", "text")
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "hamming"]
    one = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    assert simhash_neardup_pairs(one, "doc_id", "text").count() == 0


def test_containment_pairs_empty(spark):
    from spdb_spark.functions.dedup import containment_pairs, shingles

    sh = shingles(_empty_docs(spark), "doc_id", "text")
    out = containment_pairs(sh, "doc_id")
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "containment_a", "containment_b"]


def test_knn_classify_empty_queries(spark, tables):
    from pyspark.sql import functions as F

    from spdb_spark.functions.similarity import knn_classify

    embs = tables["embeddings"]
    out = knn_classify(
        embs, embs.where(F.lit(False)), "vec_id", "embedding", "label", k=3
    )
    assert out.count() == 0


def test_incremental_clusters_empty_batch_is_identity(spark):
    from spdb_spark.functions.dedup import dup_clusters, incremental_dup_clusters

    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    base = dup_clusters(pairs)
    got = {
        (r.id, r.cluster_id)
        for r in incremental_dup_clusters(
            base, spark.createDataFrame([], "id_a long, id_b long")
        ).collect()
    }
    assert got == {(r.id, r.cluster_id) for r in base.collect()}


def test_normalize_text_null_passthrough(spark):
    from spdb_spark.functions.text import normalize_text

    df = spark.createDataFrame([(1, None)], "id long, s string")
    (row,) = df.select(normalize_text(F.col("s")).alias("n")).collect()
    assert row.n is None


def test_span_removal_on_empty_and_trivial_corpus(spark):
    from spdb_spark.functions.spandedup import remove_duplicate_spans

    out = remove_duplicate_spans(_empty_docs(spark))
    assert out.count() == 0
    assert out.columns == ["doc_id", "clean_text", "n_tokens", "n_removed"]
    one = spark.createDataFrame([(1, "just a few words")], "doc_id long, text string")
    r = remove_duplicate_spans(one, window=20).collect()[0]
    assert r["clean_text"] == "just a few words" and r["n_removed"] == 0


def test_classifier_on_empty_corpus(spark):
    from spdb_spark.functions.classifier import (
        linear_text_classifier,
        nb_classifier_weights,
    )

    empty = _empty_docs(spark)
    w = nb_classifier_weights(empty, empty)
    assert w.count() == 0
    out = linear_text_classifier(empty, w)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_grams", "score", "prob"]


def test_crawl_to_corpus_on_empty_warc(spark):
    from spdb_spark.sources.crawl import crawl_to_corpus

    warc = spark.createDataFrame(
        [], "warc_type string, target_uri string, payload binary"
    )
    out = crawl_to_corpus(warc)
    assert out.count() == 0


def test_blocklist_on_empty_corpus(spark):
    from spdb_spark.functions.domains import domain_blocklist_filter

    docs = spark.createDataFrame([], "doc_id long, host string")
    assert domain_blocklist_filter(docs, ("x.com",)).count() == 0
