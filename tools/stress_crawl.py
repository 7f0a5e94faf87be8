"""Crawl-composition scale stress: replicate the documents corpus N
times (distinct doc_ids), expand it through the WARC fixture generator
(~2x records incl. respellings/mirrors/near-dup copies), and time
crawl_to_corpus end-to-end plus its stage splits.

Usage: python tools/stress_crawl.py [sf_dir] [multiplier]
Prints one JSON line; backs the SCALE.md claim that the composition's
cost is extraction-scan-bound plus the already-stress-measured dedup
joins (no superlinear term).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from spdb_spark.session import get_spark, load_tables
    from spdb_spark.sources.crawl import crawl_to_corpus
    from spdb_spark.suite_crawl import warc_records_from_docs

    spark = get_spark("stress_crawl")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    big = base.crossJoin(
        spark.range(mult).select(F.col("id").alias("rep"))
    ).select(
        # distinct ids per replica; texts repeat, so exact dedup gets a
        # real workload (each content group has `mult` members)
        (F.col("doc_id") + F.col("rep") * F.lit(1_000_000_000)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
        ).alias("text"),
    )
    warc = warc_records_from_docs(big)

    timings: dict[str, float] = {}

    def timed(label, f):
        t0 = time.perf_counter()
        r = f()
        timings[label] = round(time.perf_counter() - t0, 3)
        return r

    n_rec = timed("warc_records_count", warc.count)
    n_raw = timed(
        "extract_only",
        lambda: crawl_to_corpus(
            warc, quality=False, near_dedup=False, materialize=False
        ).count(),
    )
    n_q = timed(
        "extract_quality",
        lambda: crawl_to_corpus(
            warc, near_dedup=False, materialize=False
        ).count(),
    )
    n_full = timed(
        "full_pipeline",
        lambda: crawl_to_corpus(warc, n_docs=3 * n_rec).count(),
    )
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "multiplier": mult,
                "warc_records": n_rec,
                "extracted_docs": n_raw,
                "quality_docs": n_q,
                "final_docs": n_full,
                "timings_sec": timings,
                "loadavg": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
