"""Interleaved A/B: KN scoring before/after level-table materialization
(r15). OLD = r14-final ngramlm (top-only checkpoint, level tables
re-derived per join, auto join strategy); NEW = the installed package
(every level table lazily checkpointed + explicit broadcast hints).

The old implementation is loaded from a git snapshot written to
/tmp/ngramlm_old.py (git show <r14-commit>:spdb_spark/functions/ngramlm.py)
so both forms run interleaved in ONE session — the only adjudication
protocol that survives this box's ambient noise (see bench_ab.py).

Usage: python tools/ab_r15_kn.py [sf_dir] [passes] [order]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    order = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    spec = importlib.util.spec_from_file_location("ngramlm_old", "/tmp/ngramlm_old.py")
    old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old)

    from spdb_spark.functions import ngramlm as new
    from spdb_spark.session import get_spark
    from spdb_spark.suite_llm import _docs

    spark = get_spark("ab_r15_kn")
    spark.sparkContext.setLogLevel("ERROR")
    docs = _docs(spark, sf_dir)

    def run(mod) -> float:
        t0 = time.perf_counter()
        mod.kn_ngram_logprob(docs, order).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    run(old)
    run(new)

    ta, tb, ratios = [], [], []
    for _ in range(passes):
        a = run(old)
        b = run(new)
        ta.append(a)
        tb.append(b)
        ratios.append(b / a)
    med = sorted(ratios)[len(ratios) // 2]
    print(
        json.dumps(
            {
                "old_secs": [round(v, 3) for v in ta],
                "new_secs": [round(v, 3) for v in tb],
                "new_over_old": [round(v, 3) for v in ratios],
                "median_ratio": round(med, 3),
                "order": order,
                "sf_dir": sf_dir,
                "loadavg": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
