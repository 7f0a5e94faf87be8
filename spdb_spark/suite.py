"""Master query registry: name -> (spark_fn, oracle_sql | None).

Aggregates the per-domain suites; `__spark_entry__.py` exposes this to the
driver. oracle_sql None => driver records a weaker rows-only check (reserved
for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from spdb_spark.suite_llm import QUERIES as LLM
from spdb_spark.suite_relational import QUERIES as RELATIONAL
from spdb_spark.suite_spatial import QUERIES as SPATIAL

REGISTRY: dict = {}
REGISTRY.update(SPATIAL)
REGISTRY.update(RELATIONAL)
REGISTRY.update(LLM)


def queries():
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
