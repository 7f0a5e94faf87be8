"""Master query registry: name -> (spark_fn, oracle_sql | None).

Aggregates the per-domain suites; `__spark_entry__.py` exposes this to the
driver. oracle_sql None => driver records a weaker rows-only check (reserved
for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from spdb_spark.suite_llm import QUERIES as LLM
from spdb_spark.suite_relational import QUERIES as RELATIONAL
from spdb_spark.suite_spatial import QUERIES as SPATIAL

# The driver's correctness gate samples the FIRST 50 entries of queries() in
# iteration order, so ordering is verification policy, not cosmetics. Rounds
# 1-3 iterated SPATIAL->RELATIONAL->LLM and the driver never reached a single
# llm_* entry. Order never-driver-checked entries first (llm_* suite, then the
# unchecked relational block); the long-green spatial block goes last. The 13
# unchecked names that still spill past position 50 rotate to the front next
# round.
REGISTRY: dict = {}
REGISTRY.update(LLM)
_UNCHECKED_RELATIONAL = [
    "q2_min_cost_supplier",
    "q3_top_orders",
    "q5_region_revenue",
    "q7_nation_volume",
    "q8_brand_share",
    "q10_returned_revenue",
    "q19_bracket_revenue",
    "q_window_topk",
    "q_sessionize",
    "q_asof_join",
    "q_range_join",
    "q_setops",
    "q_event_running",
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    "q_distinct_agg",
]
for _name in _UNCHECKED_RELATIONAL:
    REGISTRY[_name] = RELATIONAL[_name]
REGISTRY.update(RELATIONAL)
REGISTRY.update(SPATIAL)


def queries():
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql():
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
