"""Local replica of the driver's correctness gate: run each suite query on
Spark AND its oracle SQL on DuckDB over the same parquet; compare row count,
schema, and order-insensitive values (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [sf_dir] [name_filter ...]
"""

from __future__ import annotations

import os
import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    return pdf


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols = sorted(spark_pdf.columns)
    d_cols = sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    s = normalize(spark_pdf)
    d = normalize(duck_pdf)
    for c in s.columns:
        sk, dk = s[c].dtype.kind, d[c].dtype.kind
        if {sk, dk} <= {"i", "u"}:
            pass
        elif sk != dk:
            problems.append(f"dtype[{c}] spark={s[c].dtype} duck={d[c].dtype}")
    if problems:
        return problems
    if len(s) != len(d):
        return problems
    for c in s.columns:
        sv, dv = s[c].to_numpy(), d[c].to_numpy()
        if s[c].dtype.kind == "f":
            if not np.allclose(sv, dv, rtol=0, atol=0, equal_nan=True):
                exact = np.array_equal(sv, dv)
                close = np.allclose(sv, dv, rtol=1e-9, equal_nan=True)
                mx = np.nanmax(np.abs(sv - dv)) if len(sv) else 0
                problems.append(
                    f"values[{c}] exact={exact} close={close} max_abs_diff={mx:.3e}"
                )
        else:
            if not np.array_equal(sv, dv):
                bad = np.nonzero(sv != dv)[0][:3]
                problems.append(
                    f"values[{c}] first diffs at rows {bad.tolist()}: "
                    f"spark={sv[bad].tolist()} duck={dv[bad].tolist()}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    from spdb_spark.session import get_spark
    from spdb_spark.suite import REGISTRY

    spark = get_spark("check_oracle", shuffle_partitions=8)
    con = duck_con(sf_dir)

    n_pass = n_fail = n_skip = 0
    for name, (fn, sql) in REGISTRY.items():
        if filters and not any(f in name for f in filters):
            continue
        try:
            sdf = fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(spark_pdf)} rows)")
            n_skip += 1
            continue
        try:
            duck_pdf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb raised: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_pdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
