"""Sketch-family stress: Bloom filter + count-min over 1M synthetic
keys on local[32] — measures build/probe/merge walls and records that
state size is fixed (m/60 words, depth*width cells) no matter the key
count. Run: python tools/stress_sketches.py [n_keys]

Also times the TFRecord encode path (the pure-Python CRC-32C is the
documented native-swap seam) so SCALE.md carries a measured number,
not a guess.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from spdb_spark.functions.membership import bloom_build, bloom_probe  # noqa: E402
from spdb_spark.functions.sketch import (  # noqa: E402
    countmin_build,
    countmin_estimate,
    countmin_merge,
)
from spdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("stress-sketches", shuffle_partitions=32)

    keys = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("url://host-"), F.col("id") % 50_000,
                 F.lit("/p"), F.col("id")).alias("key"),
    )
    keys.write.mode("overwrite").parquet("/tmp/stress_sketch_keys")
    keys = spark.read.parquet("/tmp/stress_sketch_keys")

    # --- Bloom: size for ~1% FP at n keys: m ~= 9.6 bits/key, k=7 ---
    m_bits = ((10 * n) // 60) * 60
    t0 = time.time()
    bloom = bloom_build(keys, "key", m_bits, k=7)
    n_words = bloom.count()
    t1 = time.time()
    probes = spark.range(n, n + 200_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("url://host-"), F.col("id") % 50_000,
                 F.lit("/p"), F.col("id")).alias("key"),
    )  # 200k NEVER-ingested keys -> measures the real FP rate
    fp = (
        bloom_probe(probes, "key", bloom, m_bits, k=7)
        .where(F.col("maybe_member"))
        .count()
    )
    t2 = time.time()
    print(
        f"bloom n={n} m={m_bits} k=7: build {t1-t0:.1f}s "
        f"({n_words} words = {n_words*16/1e6:.1f} MB), "
        f"probe 200k {t2-t1:.1f}s, fp_rate {fp/200_000:.4%}"
    )

    # --- count-min: 4 x 65536 cells ---
    w, d = 65_536, 4
    t0 = time.time()
    cm = countmin_build(keys, "key", w, d)
    n_cells = cm.count()
    t1 = time.time()
    est = countmin_estimate(
        keys.select("key").distinct().limit(100_000), "key", cm, w, d
    )
    est.count()
    t2 = time.time()
    halves = [
        countmin_build(keys.where(F.col("doc_id") % 2 == i), "key", w, d)
        for i in (0, 1)
    ]
    merged = countmin_merge(*halves)
    assert merged.count() == n_cells
    t3 = time.time()
    print(
        f"countmin n={n} {d}x{w}: build {t1-t0:.1f}s ({n_cells} cells), "
        f"estimate 100k keys {t2-t1:.1f}s, split-build+merge {t3-t2:.1f}s"
    )

    # --- TFRecord encode throughput (pure-Python CRC seam) ---
    from spdb_spark.sources.tfrecord import tf_example_encode, tfrecord_encode

    payloads = [
        tf_example_encode({"doc_id": [i], "text": [b"x" * 1000]})
        for i in range(2_000)
    ]
    t0 = time.time()
    blob = tfrecord_encode(payloads)
    t1 = time.time()
    mb = len(blob) / 1e6
    print(
        f"tfrecord encode 2k x 1KB examples: {t1-t0:.2f}s "
        f"({mb/(t1-t0):.1f} MB/s single-thread; scales with executor "
        f"count — and the crc32c symbol is the native-swap seam)"
    )

    spark.stop()


if __name__ == "__main__":
    main()
