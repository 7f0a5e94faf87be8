"""Dump .explain("formatted") for registry queries to plans/<tag>/<name>_<suffix>.txt.

Usage: python tools/dump_plans.py <out_dir> <suffix> [names...]
Defaults to every bench query (HEADLINE+PROMOTED+EXTRA) when no names given.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = bench.HEADLINE + bench.PROMOTED + bench.EXTRA
    from spdb_spark.session import get_spark
    from spdb_spark.suite import REGISTRY

    spark = get_spark("dump_plans", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for name in names:
        fn, _sql = REGISTRY[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()
