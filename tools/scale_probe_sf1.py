"""One-off sf1-equivalent scale probe for the heavy query family
(VERDICT r14 item 8): synthesize ~10x sf0.1 inputs for the tables the
heavy gates read (documents, lineitem), run each gate with the noop
sink at two core counts, and print the ratios — the measurable form of
the parallelism claim the plan shapes make.

Synthesis (perf probe, not an oracle fixture — no DuckDB twin needed):
- documents x10: doc_id shifted per replica; text vowel-rotated per
  replica AND tagged, so replicas are neither exact dups (which the
  corpus-construction dedup would collapse for free) nor near-dups of
  each other (which would blow the pair count quadratically and
  measure a different workload).
- lineitem x10: the three coordinate-deriving keys shifted per replica
  so the derived voxel volume actually grows (same keys would stack
  replicas onto identical (t,x,y,z) cells).
- every other table copied from sf0.1.

Usage:
    python tools/scale_probe_sf1.py build        # write /tmp/sf1synth
    SPARK_GRAFT_CPUS=8  python tools/scale_probe_sf1.py run
    SPARK_GRAFT_CPUS=32 python tools/scale_probe_sf1.py run
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1synth"
REPLICAS = 10
HEAVY = (
    "spatial_closing",
    "llm_dedup_survivors",
    "llm_crawl_corpus_ranked",
    "llm_kn5_logprob",
)


def build() -> None:
    from pyspark.sql import functions as F

    from spdb_spark.session import get_spark, load_tables

    spark = get_spark("scale_probe_build")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)
    tables = load_tables(spark, SRC)
    for name in tables:
        if name in ("documents", "lineitem"):
            continue
        dst = os.path.join(DST, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f"{name}.parquet"), dst)

    reps = spark.range(REPLICAS).select(F.col("id").cast("int").alias("_r"))

    docs = tables["documents"]
    n_docs = docs.count()
    vowels = "aeiou"
    rot = F.element_at(
        F.array(*[F.lit(vowels[k:] + vowels[:k]) for k in range(5)]),
        (F.col("_r") % 5) + 1,
    )
    scaled_docs = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_r").cast("long") * F.lit(n_docs)).alias(
                "doc_id"
            ),
            F.when(F.col("_r") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.concat(F.lit("rep"), F.col("_r")),
                    F.translate(F.col("text"), vowels, rot),
                )
            )
            .alias("text"),
            *[
                F.col(c)
                for c in docs.columns
                if c not in ("doc_id", "text")
            ],
        )
    )
    scaled_docs.repartition(32).write.mode("overwrite").parquet(
        os.path.join(DST, "documents.parquet")
    )

    li = tables["lineitem"]
    shifted = (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("_r") * F.lit(211)).alias("l_orderkey"),
            (F.col("l_partkey") + F.col("_r") * F.lit(197)).alias("l_partkey"),
            (F.col("l_suppkey") + F.col("_r") * F.lit(7)).alias("l_suppkey"),
            *[
                F.col(c)
                for c in li.columns
                if c not in ("l_orderkey", "l_partkey", "l_suppkey")
            ],
        )
    )
    shifted.repartition(32).write.mode("overwrite").parquet(
        os.path.join(DST, "lineitem.parquet")
    )
    print("built", DST)
    spark.stop()


def run() -> None:
    from spdb_spark.session import get_spark
    from spdb_spark.suite import REGISTRY

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scale_probe_run")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"cpus": int(cpus), "replicas": REPLICAS, "queries": {}}
    for name in HEAVY:
        fn, _sql = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"scale-probe {name}")
        t0 = time.perf_counter()
        fn(spark, DST).write.format("noop").mode("overwrite").save()
        out["queries"][name] = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobDescription(None)
    out["loadavg"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    {"build": build, "run": run}[sys.argv[1]]()
