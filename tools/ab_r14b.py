"""Ad-hoc interleaved A/B for the round-14 second-batch changes:

  1. minhash_lsh_dedup materialize (sig+set checkpoint) vs pure lineage
  2. q_curation_pipeline paras checkpoint vs pure lineage
  3. kn_trigram per-TYPE scoring vs per-occurrence (old form inlined)
  4. bigram per-TYPE scoring vs per-occurrence (old form inlined)

Usage: python tools/ab_r14b.py [sf_dir] [passes] [case ...]
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    only = set(sys.argv[3:])

    from spdb_spark.session import get_spark
    from spdb_spark.functions import dedup as D
    from spdb_spark.functions import text as T
    from spdb_spark.functions import sampling as SP
    from spdb_spark import suite_llm as L

    spark = get_spark("ab_r14b")
    spark.sparkContext.setLogLevel("ERROR")
    docs = L._docs(spark, sf_dir)
    n_docs = L._docs_rowcount(sf_dir)

    def minhash_new():
        return D.minhash_lsh_dedup(
            docs, "doc_id", "text", n_docs=n_docs, materialize=True
        )

    def minhash_old():
        return D.minhash_lsh_dedup(
            docs, "doc_id", "text", n_docs=n_docs, materialize=False
        )

    def curation(materialize: bool):
        kept_ids = (
            L._qf_verdicts(spark, sf_dir)
            .where(F.col("reject_reason") == "kept")
            .select("doc_id")
        )
        kept_docs = docs.join(kept_ids, "doc_id")
        paras = D.word_chunk_paragraphs(
            kept_docs, "doc_id", "text", L._PD_CHUNK
        )
        if materialize:
            from spdb_spark.session import truncate_lineage

            paras = truncate_lineage(paras, eager=False)
        kept_paras = D.paragraph_dedup(paras, min_df=2)
        clean = (
            D.reassemble_paragraph_docs(paras, kept_paras)
            .select(F.col("doc").alias("doc_id"), "clean_text")
            .join(docs.select("doc_id", "lang"), "doc_id")
        )
        return (
            SP.hash_split(clean, "doc_id")
            .groupBy("split", "lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum(T.token_count(F.col("clean_text"))).alias("n_tokens"),
            )
        )

    def kn_new():
        from spdb_spark.functions.ngramlm import kn_trigram_logprob

        return kn_trigram_logprob(docs)

    def kn_old():
        # the pre-change per-occurrence form, inlined
        from spdb_spark.functions.ngramlm import DISCOUNT, _part
        from spdb_spark.functions.text import exploded_word_ngrams, tokens
        from spdb_spark.session import truncate_lineage

        d = DISCOUNT
        toks = docs.select(
            F.col("doc_id"), tokens(F.col("text")).alias("_t")
        ).where(F.size("_t") >= 3)
        grams = exploded_word_ngrams(toks, "_t", 3, out="g", keep=("doc_id",))
        grams = truncate_lineage(grams, eager=False)
        tri = grams.groupBy("g").agg(F.count("*").alias("c3"))
        tri = truncate_lineage(tri, eager=False)
        tri_keys = tri.select(
            "g", "c3",
            _part(F.col("g"), "uv").alias("uv"),
            _part(F.col("g"), "vw").alias("vw"),
            _part(F.col("g"), "v").alias("v"),
            _part(F.col("g"), "w").alias("w"),
        )
        ctx = tri_keys.groupBy("uv").agg(
            F.sum("c3").alias("c2ctx"), F.count("*").alias("t3")
        )
        cont2 = tri_keys.groupBy("vw").agg(F.count("*").alias("n2cont"))
        mid = tri_keys.groupBy("v").agg(
            F.count("*").alias("n2ctx"), F.count_distinct("w").alias("t2")
        )
        cont1 = cont2.select(
            F.substring_index(F.col("vw"), " ", -1).alias("w")
        ).groupBy("w").agg(F.count("*").alias("n1cont"))
        totals = cont2.agg(F.count("*").alias("n2types")).crossJoin(
            cont1.agg(F.count("*").alias("t1"))
        ).crossJoin(
            toks.select(F.explode("_t").alias("_tok")).agg(
                F.count_distinct("_tok").alias("v_size")
            )
        )
        scored = (
            grams.withColumn("uv", _part(F.col("g"), "uv"))
            .withColumn("vw", _part(F.col("g"), "vw"))
            .withColumn("v", _part(F.col("g"), "v"))
            .withColumn("w", _part(F.col("g"), "w"))
            .join(tri, "g")
            .join(ctx, "uv")
            .join(mid, "v")
            .join(cont2, "vw")
            .join(cont1, "w")
            .crossJoin(F.broadcast(totals))
        )
        p1 = (
            F.greatest(F.col("n1cont") - d, F.lit(0.0)) / F.col("n2types")
            + F.lit(d) * F.col("t1") / F.col("n2types") / F.col("v_size")
        )
        p2 = (
            F.greatest(F.col("n2cont") - d, F.lit(0.0)) / F.col("n2ctx")
            + F.lit(d) * F.col("t2") / F.col("n2ctx") * p1
        )
        p3 = (
            F.greatest(F.col("c3") - d, F.lit(0.0)) / F.col("c2ctx")
            + F.lit(d) * F.col("t3") / F.col("c2ctx") * p2
        )
        lp_q = F.floor(F.log(p3) * 1e6).cast("long")
        return (
            scored.select("doc_id", lp_q.alias("_lpq"))
            .groupBy("doc_id")
            .agg(
                (
                    F.floor(F.sum("_lpq").cast("double") / F.count("*")) / 1e6
                ).alias("mean_logprob"),
                F.count("*").alias("n_trigrams"),
            )
        )

    def bigram_new():
        return L.q_bigram_logprob(spark, sf_dir)

    def bigram_old():
        toks = docs.select("doc_id", T.tokens(F.col("text")).alias("_toks"))
        grams = T.exploded_word_ngrams(
            toks, "_toks", 2, out="gram", keep=("doc_id",)
        ).withColumn("prefix", F.substring_index("gram", " ", 1))
        c2 = grams.groupBy("gram").agg(F.count("*").alias("c2"))
        c1 = grams.groupBy("prefix").agg(F.count("*").alias("c1"))
        vocab = docs.select(
            F.explode(T.tokens(F.col("text"))).alias("tok")
        ).agg(F.count_distinct("tok").alias("v"))
        scored = (
            grams.join(c2, "gram")
            .join(c1, "prefix")
            .crossJoin(F.broadcast(vocab))
            .select(
                "doc_id",
                F.log(
                    (F.col("c2") + 1) / (F.col("c1") + F.col("v"))
                ).alias("lp"),
            )
        )
        return scored.groupBy("doc_id").agg(
            (F.floor(F.avg("lp") * 1000000) / 1000000).alias("mean_logprob"),
            F.count("*").alias("n_bigrams"),
        )

    cases = {
        "minhash": (minhash_new, minhash_old),
        "curation": (
            lambda: curation(True),
            lambda: curation(False),
        ),
        "kn": (kn_new, kn_old),
        "bigram": (bigram_new, bigram_old),
    }

    def run(builder) -> float:
        t0 = time.perf_counter()
        builder().write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name, (new, old) in cases.items():
        if only and name not in only:
            continue
        run(new)
        run(old)  # warm
        tn, to, ratios = [], [], []
        for _ in range(passes):
            a = run(new)
            b = run(old)
            tn.append(a)
            to.append(b)
            ratios.append(a / b)
        print(
            f"{name}: new={[round(x,2) for x in tn]} old={[round(x,2) for x in to]} "
            f"median_ratio={statistics.median(ratios):.3f} "
            f"(new_med={statistics.median(tn):.2f}s old_med={statistics.median(to):.2f}s)"
        )
    spark.stop()


if __name__ == "__main__":
    main()
