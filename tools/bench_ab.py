"""Interleaved A/B timing for registry queries: the noise-proof way to
adjudicate a performance delta on this box.

Rounds 6-8 showed +-12% suite-level ambient noise on byte-identical
code (per-query swings up to 1.44x), so back-to-back medians cannot
distinguish a real regression from a noisy neighbor. This tool times
two queries STRICTLY INTERLEAVED (A,B,A,B,...) so both sample the same
ambient conditions, and reports per-pass paired ratios plus the median
ratio — the statistic that cancels ambient drift.

Usage:
    python tools/bench_ab.py QUERY_A QUERY_B [sf_dir] [passes]

Pass the same name twice to measure the box's residual pairing noise
(the ratio distribution should straddle 1.0). Typical adjudication:
compare an operator's two physical forms (llm_dedup_minhash vs
llm_dedup_minhash_shuffle), or a query before/after an optimization by
checking out the two versions under different names.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    name_a, name_b = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    passes = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    from spdb_spark.session import get_spark
    from spdb_spark.suite import REGISTRY

    spark = get_spark("bench_ab")
    spark.sparkContext.setLogLevel("ERROR")
    fn_a, _ = REGISTRY[name_a]
    fn_b, _ = REGISTRY[name_b]

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both (codegen + input caches) outside the timed region
    run(fn_a)
    run(fn_b)

    ta, tb, ratios = [], [], []
    for _ in range(passes):
        a = run(fn_a)
        b = run(fn_b)
        ta.append(a)
        tb.append(b)
        ratios.append(b / a)
    med = sorted(ratios)[len(ratios) // 2]
    print(
        json.dumps(
            {
                "a": name_a,
                "b": name_b,
                "sf_dir": sf_dir,
                "passes": passes,
                "a_secs": [round(v, 3) for v in ta],
                "b_secs": [round(v, 3) for v in tb],
                "paired_ratios_b_over_a": [round(v, 3) for v in ratios],
                "median_ratio": round(med, 3),
                "loadavg": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
