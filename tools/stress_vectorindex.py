"""Streaming vector-index stress: prove the per-batch append cost is
O(batch) — flat walls as the index grows — and that query cost tracks
probed-list size, not append count (until compaction is the right call).

Bootstraps an IVF-PQ index over one batch of clustered vectors, appends
N more batches of the same size through StreamingVectorIndex, timing
each, then times an indexed top-k before and after compact()+vacuum().

Usage: python tools/stress_vectorindex.py [n_batches] [batch_rows]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from pyspark.sql import functions as F

    from spdb_spark.session import get_spark
    from spdb_spark.streaming.vectorindex import StreamingVectorIndex
    from tools.ann_recall import make_clustered

    spark = get_spark("stress_vectorindex")
    spark.sparkContext.setLogLevel("ERROR")
    total = batch_rows * (n_batches + 1)
    vecs = make_clustered(
        spark, n=total, dim=64, n_clusters=64, noise=0.3
    ).persist()
    vecs.count()
    tmp = tempfile.mkdtemp(prefix="vidxstress-")
    try:
        idx = os.path.join(tmp, "idx")
        t0 = time.perf_counter()
        sink = StreamingVectorIndex(
            spark, idx, kind="ivfpq", dim=64, n_centroids=64,
            bootstrap=vecs.where(F.col("vec_id") < batch_rows),
        )
        print(f"bootstrap ({batch_rows} rows): {time.perf_counter() - t0:.2f}s")
        walls = []
        for b in range(n_batches):
            lo = batch_rows * (b + 1)
            batch = vecs.where(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + batch_rows)
            )
            t0 = time.perf_counter()
            sink.process_batch(batch, b)
            walls.append(time.perf_counter() - t0)
            print(f"append batch {b + 1}/{n_batches}: {walls[-1]:.2f}s")
        queries = vecs.where(F.col("vec_id") % (total // 20) == 0)
        t0 = time.perf_counter()
        sink.topk(queries, vecs, k=10, rerank=50).write.format("noop").mode(
            "overwrite"
        ).save()
        pre = time.perf_counter() - t0
        t0 = time.perf_counter()
        sink.compact()
        sink.vacuum()
        comp = time.perf_counter() - t0
        t0 = time.perf_counter()
        sink.topk(queries, vecs, k=10, rerank=50).write.format("noop").mode(
            "overwrite"
        ).save()
        post = time.perf_counter() - t0
        n_files = sum(
            len(fs) for _, _, fs in os.walk(os.path.join(idx))
        )
        print(
            f"append walls: first={walls[0]:.2f}s last={walls[-1]:.2f}s "
            f"(flat == O(batch)); topk pre-compact={pre:.2f}s "
            f"compact+vacuum={comp:.2f}s topk post-compact={post:.2f}s; "
            f"{n_files} files in index"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
