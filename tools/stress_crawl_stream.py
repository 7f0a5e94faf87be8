"""Streaming crawl-composition stress: replicate the documents corpus,
encode the WARC fixture into N feed files, drive StreamingCrawlCorpus
one file per micro-batch, and time each batch plus the corpus() read.

What the numbers substantiate (SCALE.md): per-batch cost must track the
BATCH (its extraction + its minhash against the band index), not the
accumulated corpus — the sink probes the persisted index instead of
re-pairing the corpus with itself, so batch walls should stay flat as
state grows, with only the index-probe join widening slowly. The
corpus() read is one min-struct aggregate + bounded joins over the
accumulated state.

Usage: python tools/stress_crawl_stream.py [sf_dir] [multiplier] [n_files]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from spdb_spark.session import get_spark, load_tables
    from spdb_spark.sources.warc import warc_encode
    from spdb_spark.streaming.crawl import StreamingCrawlCorpus, stream_crawl_docs
    from spdb_spark.suite_crawl import warc_records_from_docs

    spark = get_spark("stress_crawl_stream")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_tables(spark, sf_dir)["documents"].select("doc_id", "text")
    big = base.crossJoin(
        spark.range(mult).select(F.col("id").alias("rep"))
    ).select(
        (F.col("doc_id") + F.col("rep") * F.lit(1_000_000_000)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
        ).alias("text"),
    )
    recs = warc_records_from_docs(big).collect()

    tmp = tempfile.mkdtemp(prefix="crawlstream-stress-")
    feed = os.path.join(tmp, "feed")
    os.makedirs(feed)
    files: list[list[dict]] = [[] for _ in range(n_files)]
    for i, r in enumerate(recs):
        files[i % n_files].append(
            {
                "warc_type": r.warc_type,
                "target_uri": r.target_uri,
                "payload": bytes(r.payload),
            }
        )
    for j, fl in enumerate(files):
        with open(os.path.join(feed, f"f{j:03d}.warc.gz"), "wb") as f:
            f.write(warc_encode(fl))

    sink = StreamingCrawlCorpus(spark, os.path.join(tmp, "state"))
    batch_walls: list[float] = []
    orig = sink.process_batch

    def timed_batch(batch, batch_id):
        t0 = time.perf_counter()
        orig(batch, batch_id)
        batch_walls.append(round(time.perf_counter() - t0, 3))

    sink.process_batch = timed_batch
    t0 = time.perf_counter()
    q = sink.start(
        stream_crawl_docs(spark, feed, max_files_per_trigger=1),
        os.path.join(tmp, "ckpt"),
    )
    q.awaitTermination(3600)
    stream_wall = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    n_corpus = sink.corpus().count()
    corpus_read = round(time.perf_counter() - t0, 3)
    n_pairs = sink.pairs().count()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "multiplier": mult,
                "n_files": n_files,
                "n_records": len(recs),
                "batch_walls_sec": batch_walls,
                "stream_wall_sec": stream_wall,
                "corpus_read_sec": corpus_read,
                "n_corpus": n_corpus,
                "n_neardup_pairs": n_pairs,
            }
        )
    )
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
