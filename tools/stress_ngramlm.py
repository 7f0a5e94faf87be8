"""Kneser-Ney LM stress: the fixture corpus has a 31-token vocabulary,
so its trigram TYPE tables are trivially broadcastable — this harness
synthesizes the corpus shape that actually stresses the LM join
topology: N docs x ~60 tokens drawn Zipf-ish (log-uniform inverse CDF)
from a 50k-word vocabulary, all deterministic md5 arithmetic (no
rand()), so count tables grow to millions of n-gram types and the
score-stream joins leave broadcast range.

Measures: kn_model table sizes + wall, self-scoring wall, frozen-model
scoring of a held-out slice. Run: python tools/stress_ngramlm.py [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spdb_spark.functions.ngramlm import (  # noqa: E402
    kn_model,
    kn_score,
    kn_trigram_logprob,
)
from spdb_spark.session import get_spark  # noqa: E402

VOCAB = 50_000
DOC_TOKENS = 60


def synth_docs(spark, n_docs: int):
    """doc_id, text: tokens 'w<id>' with id log-uniform in [0, VOCAB) —
    frequency ~ 1/id, the Zipf shape real vocabularies have."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("j"))), 1, 12
            ),
            16,
            10,
        ).cast("double")
        / float(16**12)
    )
    word = F.floor(F.exp(u * float(__import__("math").log(VOCAB)))).cast("long")
    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1))).alias("j"),
        )
        .select("doc_id", F.concat(F.lit("w"), word).alias("tok"))
        .groupBy("doc_id")
        .agg(F.concat_ws(" ", F.collect_list("tok")).alias("text"))
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("stress-ngramlm", shuffle_partitions=32)

    path = "/tmp/stress_kn_docs"
    synth_docs(spark, n_docs).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    t0 = time.time()
    model = kn_model(docs)
    sizes = {k: model[k].count() for k in ("tri", "ctx", "mid", "cont2", "cont1")}
    t1 = time.time()
    print(
        f"kn_model over {n_docs} docs x {DOC_TOKENS} toks: {t1-t0:.1f}s; "
        f"types: {sizes}"
    )

    t0 = time.time()
    kn_trigram_logprob(docs).write.mode("overwrite").format("noop").save()
    t1 = time.time()
    print(f"self-scoring (train+score, {n_docs} docs): {t1-t0:.1f}s")

    new = synth_docs(spark, n_docs // 10).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    t0 = time.time()
    kn_score(new, model).write.mode("overwrite").format("noop").save()
    t1 = time.time()
    print(f"frozen-model scoring of {n_docs // 10} new docs: {t1-t0:.1f}s")

    spark.stop()


if __name__ == "__main__":
    main()
