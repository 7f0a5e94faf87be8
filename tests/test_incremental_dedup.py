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
