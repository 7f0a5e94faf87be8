"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query at sf0.001 (smoke check).
- ``queries()``: one entry per implemented operator from SURVEY.md §2 plus
  the LLM-pipeline extensions — see spdb_spark/suite*.py.
- ``oracle_sql()``: DuckDB-equivalent SQL for EVERY query. The two
  genuinely sketch-based ops (HLL vocabulary estimate, GK approximate
  quantiles) use tolerance-protocol oracles: the Spark query emits an
  in-plan bound check (estimate within the sketch's documented error of
  the exact value computed in the same plan) that the SQL asserts
  exactly — so the driver records a value-hash match rather than a
  rows-only row.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H q1 pricing summary over sf0.001."""
    from spdb_spark.suite_relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spdb_spark.suite import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from spdb_spark.suite import oracle_sql as _oracle_sql

    return _oracle_sql()
