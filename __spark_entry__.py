"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query at sf0.001 (smoke check).
- ``queries()``: one entry per implemented operator from SURVEY.md §2 plus
  the LLM-pipeline extensions — see spdb_spark/suite*.py.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (omitted only for the
  two genuinely sketch-based ops: the HLL vocabulary estimate and GK
  approximate quantiles — every other query, including the LSH/IVF/
  quantized ANN scale paths, carries an exact oracle).
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
