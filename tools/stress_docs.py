"""Document-corpus stress harness: synthesize an N-replica corpus from the
sf0.1 documents table (each replica keeps the text's shingle structure but
gets a distinct marker token, so near-dup families of size N exist by
construction) and time the curation operators on it.

This is the LLM-side counterpart of tools/stress_scale.py (voxels): the
point is measured evidence that the dedup/shuffle/retrieval plans hold
when the corpus is 20-100x the bench fixture.

Usage: python tools/stress_docs.py [replicas=20]
       python tools/stress_docs.py --skew [family=5000]

--skew (round 6): the PATHOLOGICAL corpora the uniform replica sweep
can't produce —
  (a) one exact near-dup family of `family` docs: every MinHash band of
      the family hashes to ONE bucket, so the band join carries a single
      hot key with family^2/2 candidate pairs (what AQE skew handling
      and the banded join must survive);
  (b) `family` otherwise-distinct docs sharing one boilerplate sentence:
      each boilerplate shingle has doc-frequency = family, so the
      UNCAPPED pair join is quadratic in it — measured against the
      max_doc_freq stop-shingle cap that drops it.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def skew_main() -> None:
    family = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    from spdb_spark.session import get_spark

    spark = get_spark("stress_skew")
    spark.sparkContext.setLogLevel("ERROR")
    from spdb_spark.functions import dedup as D

    def timed(name, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.perf_counter() - t0:.2f} s")

    # (a) one giant exact near-dup family: a single saturated band bucket
    base_text = "the quick brown fox jumps over the lazy dog again and again"
    fam = spark.range(family).select(
        F.col("id").alias("doc_id"),
        F.lit(base_text).alias("text"),
    )
    filler = spark.range(family, family + 20000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("unique body"),
            F.col("id").cast("string"),
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") * 7).cast("string")),
        ).alias("text"),
    )
    corpus = fam.unionByName(filler).repartition(64).persist()
    n = corpus.count()
    print(f"(a) band-skew corpus: {n} docs, one {family}-doc exact family")
    cands = D.lsh_candidate_pairs(
        D.minhash_signatures(
            D.shingles(corpus, "doc_id", "text", 3, distinct=False), "doc_id"
        ),
        bands=8,
        rows=2,
    )
    timed(f"  lsh_candidate_pairs (hot bucket ~{family}^2/2 pairs)", cands)
    corpus.unpersist()

    # (b) hot boilerplate shingle: capped vs uncapped pair join
    boiler = "this page is copyright by the example corporation all rights reserved"
    docs = spark.range(family).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("body"),
            F.md5(F.col("id").cast("string")),
            F.md5((F.col("id") * 3).cast("string")),
            F.md5((F.col("id") * 5).cast("string")),
            F.lit(boiler),
        ).alias("text"),
    ).repartition(64).persist()
    docs.count()
    sh = D.shingles(docs, "doc_id", "text", k=3)
    print(f"(b) boilerplate corpus: {family} docs sharing one {len(boiler.split())}-token footer")
    timed(
        "  jaccard_pairs CAPPED (max_doc_freq=100)",
        D.jaccard_pairs(sh, "doc_id", threshold=0.2, max_doc_freq=100),
    )
    timed(
        "  jaccard_pairs UNCAPPED (hot-shingle quadratic)",
        D.jaccard_pairs(sh, "doc_id", threshold=0.2),
    )
    docs.unpersist()
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        skew_main()
        return
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from spdb_spark.session import get_spark, load_tables

    spark = get_spark("stress_docs")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_tables(spark, "/root/testdata/sf0.1", names=("documents",))[
        "documents"
    ].select("doc_id", "text", "lang", "source")

    n_base = base.count()
    rep = F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))).alias("rep")
    corpus = (
        base.select("doc_id", "text", "lang", "source", rep)
        .select(
            (F.col("doc_id") + F.col("rep") * (n_base * 10)).alias("doc_id"),
            # distinct marker token per replica: replicas are NEAR dups
            # (high Jaccard, not exact), the realistic worst case
            F.concat_ws(" ", F.col("text"), F.concat(F.lit("rep"), F.col("rep"))).alias(
                "text"
            ),
            "lang",
            "source",
        )
        .repartition(64)
        .persist()
    )
    n = corpus.count()
    print(f"corpus: {n} docs ({replicas}x sf0.1)")

    def timed(name, df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.perf_counter() - t0:.2f} s")

    from spdb_spark.functions import dedup as D
    from spdb_spark.functions import sampling as SP
    from spdb_spark.functions import text as T

    timed("exact_dedup", D.exact_dup_groups(corpus, "doc_id", "text"))
    timed(
        "minhash_lsh (near-dup families of size %d)" % replicas,
        D.minhash_lsh_dedup(corpus, "doc_id", "text"),
    )
    timed(
        "simhash_pairs (64-bit, 16-bit bands)",
        D.simhash_neardup_pairs(corpus, "doc_id", "text", bits=64, bands=4, max_hamming=3),
    )
    timed(
        "deterministic_shuffle (derived width)",
        SP.deterministic_shuffle(corpus, "doc_id", n_rows=n),
    )
    timed(
        "reservoir_per_group k=100",
        SP.reservoir_per_group(corpus, "lang", "doc_id", 100, n_rows=n),
    )
    paras = D.word_chunk_paragraphs(corpus, "doc_id", "text", 40)
    timed("paragraph_dedup", D.paragraph_dedup(paras, min_df=2))
    timed("quality+langid scan", corpus.select(
        "doc_id",
        T.lang_id(F.col("text")).alias("lang_pred"),
        T.quality_score(F.col("text")).alias("q"),
    ))
    from spdb_spark.functions.retrieval import bm25_scores

    timed("bm25 full-scan", bm25_scores(corpus, "doc_id", "text", ("scan", "merge")))

    from spdb_spark.functions import dsir

    target = corpus.where(F.col("doc_id") % 100 == 0)
    lr = dsir.dsir_bucket_logratio(corpus, target, n_buckets=10_000).persist()
    timed("dsir fit (10k buckets)", lr)
    w = dsir.dsir_weights(corpus, lr, n_buckets=10_000)
    timed("dsir weights", w)
    timed("dsir resample k=10k", dsir.dsir_resample(w, 10_000))
    lr.unpersist()
    corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
