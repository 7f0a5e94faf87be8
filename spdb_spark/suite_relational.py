"""Relational suite: scans, joins (broadcast/semi/anti/as-of/range), aggs,
windows, set ops, rollup, JSON and scalar functions — the general-purpose
operator surface (SURVEY.md §2.5/§2.7 "built-in if added" rows + north-star
additions), each with a DuckDB oracle.

Float policy: money aggregates are computed on exact integer cents
(prices/discounts/taxes are 2dp; 0-decimal ROUND is half-away-from-zero in
both engines) — double summation order varies across partitions AND runs,
so summing doubles then rounding is latently nondeterministic at decimal
tie points. Integer sums are exact; final /100.0 divisions and
floor-scalings of the resulting doubles are bit-identical in both engines.
Per-row scalar math needs no such care (deterministic in both).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spdb_spark.operators.relational import asof_join_backward, range_join_buckets
from spdb_spark.session import load_tables


def _t(spark, sf_dir, *names):
    tabs = load_tables(spark, sf_dir, names=tuple(names))
    return [tabs[n] for n in names]


# --- q1: pricing summary (scan + filter + groupBy agg) ---------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money terms computed on exact integer cents (prices/discounts/taxes
    are 2dp): double summation order varies across partitions AND engines,
    so summing doubles then rounding is nondeterministic at tie points.
    Integer sums are exact; the final /100.0 division and floor-scaled
    averages are bit-identical in both engines."""
    (li,) = _t(spark, sf_dir, "lineitem")
    pc = F.round(F.col("l_extendedprice") * 100).cast("long")
    d100 = F.round(F.col("l_discount") * 100).cast("long")
    t100 = F.round(F.col("l_tax") * 100).cast("long")
    fl6 = lambda c: F.floor(c * 1000000) / 1000000  # noqa: E731
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .select("l_returnflag", "l_linestatus", "l_quantity",
                pc.alias("pc"), d100.alias("d100"), t100.alias("t100"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            (F.sum("pc") / 100.0).alias("sum_base_price"),
            (F.expr("sum(pc * (100 - d100)) div 100") / 100.0).alias("sum_disc_price"),
            (F.expr("sum(pc * (100 - d100) * (100 + t100)) div 10000") / 100.0).alias("sum_charge"),
            fl6(F.avg("l_quantity")).alias("avg_qty"),
            fl6(F.sum("pc") / F.count("*") / 100.0).alias("avg_price"),
            fl6(F.sum("d100") / F.count("*") / 100.0).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(pc) AS BIGINT) / 100.0 AS sum_base_price,
       (CAST(SUM(pc * (100 - d100)) AS BIGINT) // 100) / 100.0 AS sum_disc_price,
       (CAST(SUM(pc * (100 - d100) * (100 + t100)) AS BIGINT) // 10000) / 100.0 AS sum_charge,
       FLOOR(AVG(l_quantity) * 1000000) / 1000000 AS avg_qty,
       FLOOR((CAST(SUM(pc) AS BIGINT) / COUNT(*) / 100.0) * 1000000) / 1000000 AS avg_price,
       FLOOR((CAST(SUM(d100) AS BIGINT) / COUNT(*) / 100.0) * 1000000) / 1000000 AS avg_disc,
       COUNT(*) AS count_order
FROM (
  SELECT l_returnflag, l_linestatus, l_quantity,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS d100,
         CAST(ROUND(l_tax * 100) AS BIGINT) AS t100
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
)
GROUP BY l_returnflag, l_linestatus
"""


# --- q3: top-10 revenue orders (3-way join + topk) -------------------------

def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.expr("sum(cast(round(l_extendedprice * 100) as bigint) * (100 - cast(round(l_discount * 100) as bigint))) div 100") / 100.0).alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


SQL_Q3 = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority,
(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) // 100) / 100.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


# --- q5: regional revenue (6-way join incl. broadcast dims) ----------------

def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, cust, supp, orders, li = _t(
        spark, sf_dir, "region", "nation", "customer", "supplier", "orders", "lineitem"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("r_name", "n_name")
        .agg(
            (F.expr("sum(cast(round(l_extendedprice * 100) as bigint) * (100 - cast(round(l_discount * 100) as bigint))) div 100") / 100.0).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_Q5 = """
SELECT r_name, n_name,
(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) // 100) / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY r_name, n_name
"""


# --- q4-ish: semi join (EXISTS) --------------------------------------------

def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    shipped_late = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(
            shipped_late, orders.o_orderkey == shipped_late.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SQL_SEMI_JOIN = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
"""


# --- anti join -------------------------------------------------------------

def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    urgent = orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            (F.expr("sum(cast(round(c_acctbal * 100) as bigint))") / 100.0).alias("sum_acctbal"),
        )
    )


SQL_ANTI_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_acctbal
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
GROUP BY c_mktsegment
"""


# --- window: top-3 customers per nation ------------------------------------

def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, cust, orders = _t(spark, sf_dir, "nation", "customer", "orders")
    rev = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey", "c_name")
        .agg((F.expr("sum(cast(round(o_totalprice * 100) as bigint))") / 100.0).alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy(F.desc("revenue"), F.col("c_custkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("n_name", "c_custkey", "c_name", "revenue", F.col("rk").cast("long").alias("rk"))
    )


SQL_WINDOW_TOPK = """
SELECT n_name, c_custkey, c_name, revenue, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT n_name, c_custkey, c_name,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS revenue,
         ROW_NUMBER() OVER (
           PARTITION BY n_name
           ORDER BY CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) DESC, c_custkey
         ) AS rk
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, c_custkey, c_name
)
WHERE rk <= 3
"""


# --- events: running sums + lag deltas (analytic windows) ------------------

def q_event_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms")
    e = events.where(F.col("user_id") % 50 == 0).select(
        "user_id", "event_id", "value", ts_ms
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4
        ).alias("running_value"),
        (F.col("ts_ms") - F.lag("ts_ms", 1).over(w)).alias("delta_ms"),
        F.row_number().over(w).cast("long").alias("seq"),
    )


SQL_EVENT_RUNNING = """
SELECT user_id, event_id,
       ROUND(SUM(value) OVER (
         PARTITION BY user_id ORDER BY ts_ms, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
       ts_ms - LAG(ts_ms, 1) OVER (
         PARTITION BY user_id ORDER BY ts_ms, event_id) AS delta_ms,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY user_id ORDER BY ts_ms, event_id) AS BIGINT) AS seq
FROM (
  SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms
  FROM events WHERE user_id % 50 = 0
)
"""


# --- events: sessionization (gaps-and-islands) -----------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    e = events.select(
        "user_id", "event_id", F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            (F.col("ts_ms") - F.lag("ts_ms", 1).over(w)) > 30 * 60 * 1000, 1
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            (F.max("session_id") + 1).alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


SQL_SESSIONIZE = """
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_ms,
         CASE WHEN ts_ms - LAG(ts_ms, 1) OVER (
                PARTITION BY user_id ORDER BY ts_ms, event_id) > 1800000
              THEN 1 ELSE 0 END AS new_session
  FROM e
),
sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts_ms, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id, CAST(MAX(session_id) + 1 AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM sessions GROUP BY user_id
"""


# --- rollup ----------------------------------------------------------------

def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


SQL_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --- distinct aggregation --------------------------------------------------

def q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count("*").alias("n_items"),
        )
    )


SQL_DISTINCT_AGG = """
SELECT s_name, COUNT(DISTINCT l_partkey) AS n_parts,
       COUNT(DISTINCT l_orderkey) AS n_orders, COUNT(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_name
"""


# --- set ops ---------------------------------------------------------------

def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, = _t(spark, sf_dir, "orders")
    f_cust = orders.where(F.col("o_orderstatus") == "F").select("o_custkey")
    o_cust = orders.where(F.col("o_orderstatus") == "O").select("o_custkey")
    p_cust = orders.where(F.col("o_orderstatus") == "P").select("o_custkey")
    both = f_cust.intersect(o_cust)
    return both.exceptAll(p_cust.distinct()).distinct().select(
        F.col("o_custkey").alias("custkey")
    )


SQL_SETOPS = """
SELECT DISTINCT custkey FROM (
  (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
   INTERSECT
   SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
  EXCEPT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
)
"""


# --- as-of join ------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    ts_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    purchases = events.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), ts_ms.alias("ts_ms")
    )
    clicks = (
        events.where(F.col("event_type") == "click")
        .select("user_id", ts_ms.alias("ts_ms"), "event_id")
        .groupBy("user_id", "ts_ms")
        .agg(F.max("event_id").alias("click_id"))
    )
    joined = asof_join_backward(
        purchases, clicks, on=["user_id"], ts="ts_ms", right_cols=["click_id"]
    )
    return joined.select(
        "user_id",
        "purchase_id",
        F.coalesce(F.col("click_id_right"), F.lit(-1)).alias("last_click_id"),
    )


SQL_ASOF_JOIN = """
WITH purchases AS (
  SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS ts_ms
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, epoch_ms(ts)
)
SELECT p.user_id, p.purchase_id,
       COALESCE(c.click_id, -1) AS last_click_id
FROM purchases p
ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND c.ts_ms <= p.ts_ms
"""


# --- range join ------------------------------------------------------------

_JAN1_MS = 1704067200000  # 2024-01-01T00:00:00Z
_BUCKET_MS = 6 * 3600 * 1000


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    e = events.select(
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"), "value"
    )
    joined = range_join_buckets(e, "ts_ms", _JAN1_MS, _BUCKET_MS, 31 * 4)
    return joined.groupBy("bucket").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


SQL_RANGE_JOIN = f"""
SELECT b.bucket, COUNT(*) AS n_events, ROUND(SUM(e.value), 4) AS sum_value
FROM (SELECT epoch_ms(ts) AS ts_ms, value FROM events) e
JOIN (
  SELECT CAST(r.range AS BIGINT) AS bucket,
         {_JAN1_MS} + CAST(r.range AS BIGINT) * {_BUCKET_MS} AS b_start,
         {_JAN1_MS} + (CAST(r.range AS BIGINT) + 1) * {_BUCKET_MS} AS b_end
  FROM range(0, {31 * 4}) r
) b ON e.ts_ms >= b.b_start AND e.ts_ms < b.b_end
GROUP BY b.bucket
"""


# --- sliding event-time windows (batch form of the streaming op) -----------

_SLIDE_MS = 6 * 3600 * 1000
_WIN_MS = 12 * 3600 * 1000


def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12h windows sliding by 6h over events (each event lands in 2
    windows) — the batch equivalent of streaming/windows.py, oracle-checked
    via explicit window-start arithmetic."""
    (events,) = _t(spark, sf_dir, "events")
    e = events.select(
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "value",
    )
    k = F.floor(F.col("ts_ms") / _SLIDE_MS)
    windowed = e.select(
        "event_type",
        "value",
        F.explode(
            F.array((k - 1) * _SLIDE_MS, k * _SLIDE_MS)
        ).alias("window_start_ms"),
        "ts_ms",
    ).where(
        (F.col("ts_ms") >= F.col("window_start_ms"))
        & (F.col("ts_ms") < F.col("window_start_ms") + _WIN_MS)
    )
    return windowed.groupBy("window_start_ms", "event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


SQL_SLIDING_WINDOW = f"""
SELECT window_start_ms, event_type, COUNT(*) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM (
  SELECT event_type, value, ts_ms,
         ((ts_ms // {_SLIDE_MS}) + d.k) * {_SLIDE_MS} AS window_start_ms
  FROM (SELECT event_type, value, epoch_ms(ts) AS ts_ms FROM events)
  CROSS JOIN (VALUES (CAST(-1 AS BIGINT)), (0)) AS d(k)
)
WHERE ts_ms >= window_start_ms AND ts_ms < window_start_ms + {_WIN_MS}
GROUP BY window_start_ms, event_type
"""


# --- JSON ------------------------------------------------------------------

def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_JSON_EXTRACT = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


# --- correlated-style: parts above brand average (window) ------------------

def q_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window average on exact integer cents: double summation order differs
    between engines, so averaging doubles directly is nondeterministic at
    rounding boundaries — cents make the window agg exact in both."""
    (part,) = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    cents = F.round(F.col("p_retailprice") * 100).cast("long")
    return (
        part.withColumn("price_cents", cents)
        .withColumn("brand_avg_cents", F.avg("price_cents").over(w))
        .where(F.col("price_cents") > F.col("brand_avg_cents"))
        .select(
            "p_partkey",
            "p_brand",
            "p_retailprice",
            (F.floor(F.col("brand_avg_cents") / 100 * 10000) / 10000).alias("brand_avg"),
        )
    )


SQL_ABOVE_BRAND_AVG = """
SELECT p_partkey, p_brand, p_retailprice,
       FLOOR(brand_avg_cents / 100 * 10000) / 10000 AS brand_avg
FROM (
  SELECT p_partkey, p_brand, p_retailprice,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
         AVG(CAST(ROUND(p_retailprice * 100) AS BIGINT))
           OVER (PARTITION BY p_brand) AS brand_avg_cents
  FROM part
)
WHERE price_cents > brand_avg_cents
"""


# --- scalar gauntlets ------------------------------------------------------

def q_scalar_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return part.where(F.col("p_partkey") % 7 == 0).select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "").alias("name_novowels"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.abs(F.col("p_size") - 25).cast("long").alias("size_dev"),
        (F.col("p_size") % 5).cast("long").alias("size_mod"),
    )


SQL_SCALAR_STRING_MATH = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       REGEXP_REPLACE(p_name, '[aeiou]', '', 'g') AS name_novowels,
       ROUND(SQRT(p_retailprice), 6) AS price_sqrt,
       ROUND(LN(p_retailprice), 6) AS price_ln,
       CAST(ABS(p_size - 25) AS BIGINT) AS size_dev,
       CAST(p_size % 5 AS BIGINT) AS size_mod
FROM part WHERE p_partkey % 7 = 0
"""


def q_scalar_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.where(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.quarter("o_orderdate").cast("long").alias("qtr"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("long").alias("days_to_2002"),
    )


SQL_SCALAR_DATES = """
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS mo,
       CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS dy,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS BIGINT) AS qtr,
       strftime(o_orderdate, '%Y-%m') AS ym,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT)
         AS days_to_2002
FROM orders WHERE o_orderkey % 13 = 0
"""


# --- conditional pivot -----------------------------------------------------

def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, cust, orders = _t(spark, sf_dir, "nation", "customer", "orders")
    j = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    cents = F.expr("cast(round(o_totalprice * 100) as bigint)")
    status_sum = lambda s: (  # noqa: E731
        F.sum(F.when(F.col("o_orderstatus") == s, cents).otherwise(F.lit(0).cast("long")))
        / 100.0
    )
    return j.groupBy("n_name").agg(
        status_sum("F").alias("total_f"),
        status_sum("O").alias("total_o"),
        status_sum("P").alias("total_p"),
    )


SQL_PIVOT_STATUS = """
SELECT n_name,
       CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS total_f,
       CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS total_o,
       CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS total_p
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


# --- q2-like: min-price supplier per part (agg subquery join) --------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each part sold by >1 supplier, the supplier(s) with the minimum
    account balance (q2's correlated-min shape on available columns)."""
    li, supp, part = _t(spark, sf_dir, "lineitem", "supplier", "part")
    pairs = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    min_bal = pairs.groupBy("l_partkey").agg(
        F.min("s_acctbal").alias("min_bal"), F.count("*").alias("n_supp")
    )
    return (
        pairs.join(min_bal, "l_partkey")
        .where((F.col("s_acctbal") == F.col("min_bal")) & (F.col("n_supp") > 1))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            F.col("s_name").alias("cheapest_supplier"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )


SQL_Q2_MIN_COST = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
j AS (
  SELECT p.l_partkey, s.s_name, s.s_acctbal FROM pairs p
  JOIN supplier s ON p.l_suppkey = s.s_suppkey
),
m AS (
  SELECT l_partkey, MIN(s_acctbal) AS min_bal, COUNT(*) AS n_supp
  FROM j GROUP BY l_partkey
)
SELECT p_partkey, p_name, j.s_name AS cheapest_supplier,
       ROUND(j.s_acctbal, 2) AS acctbal
FROM j JOIN m ON j.l_partkey = m.l_partkey
JOIN part ON j.l_partkey = p_partkey
WHERE j.s_acctbal = m.min_bal AND m.n_supp > 1
"""


# --- q7-like: revenue between nation pairs by year -------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, cust, supp, orders, li = _t(
        spark, sf_dir, "nation", "customer", "supplier", "orders", "lineitem"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") < F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg((F.expr("sum(cast(round(l_extendedprice * 100) as bigint) * (100 - cast(round(l_discount * 100) as bigint))) div 100") / 100.0).alias("revenue"))
    )


SQL_Q7_NATION_VOLUME = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT) * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) // 100) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
"""


# --- q8-like: market share of one brand per year ---------------------------

def q8_brand_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, li = _t(spark, sf_dir, "part", "lineitem")
    vol_e4 = F.expr(
        "cast(round(l_extendedprice * 100) as bigint)"
        " * (100 - cast(round(l_discount * 100) as bigint))"
    )
    j = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.year("l_shipdate").cast("long").alias("l_year"),
            vol_e4.alias("vol_e4"),
            F.when(F.col("p_brand") == "Brand#1", vol_e4).otherwise(F.lit(0).cast("long")).alias("brand_e4"),
        )
    )
    return j.groupBy("l_year").agg(
        (F.expr("sum(vol_e4) div 100") / 100.0).alias("total_volume"),
        (F.expr("sum(brand_e4) div 100") / 100.0).alias("brand_volume"),
        F.expr("(sum(brand_e4) * 1000000) div sum(vol_e4)").alias("share_ppm"),
    )


SQL_Q8_BRAND_SHARE = """
SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       (CAST(SUM(vol_e4) AS BIGINT) // 100) / 100.0 AS total_volume,
       (CAST(SUM(brand_e4) AS BIGINT) // 100) / 100.0 AS brand_volume,
       (CAST(SUM(brand_e4) AS BIGINT) * 1000000) // CAST(SUM(vol_e4) AS BIGINT) AS share_ppm
FROM (
  SELECT l_shipdate,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS vol_e4,
         CASE WHEN p_brand = 'Brand#1'
              THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
              ELSE 0 END AS brand_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
GROUP BY EXTRACT(YEAR FROM l_shipdate)
"""


# --- q10-like: top customers by returned revenue ---------------------------

def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    rev = F.expr(
        "sum(cast(round(l_extendedprice * 100) as bigint)"
        " * (100 - cast(round(l_discount * 100) as bigint))) div 100"
    ) / 100.0
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(rev.alias("revenue"), F.count("*").alias("n_items"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


SQL_Q10_RETURNED = """
SELECT c_custkey, c_name, n_name,
       (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) // 100)
         / 100.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- exact quantiles -------------------------------------------------------

def q_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` and
    DuckDB `quantile_cont` share linear interpolation — verified
    bit-identical). The approx_percentile/t-digest path is the 100TB
    variant (sketch-based, not oracle-comparable)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
            F.min("l_extendedprice").alias("pmin"),
            F.max("l_extendedprice").alias("pmax"),
        )
    )


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB quantile path: `approx_percentile` (Greenwald-Khanna
    sketch, mergeable across partitions — one partial-agg shuffle of
    fixed-size sketches instead of sorting the column). Guaranteed rank
    error <= n/accuracy.

    Tolerance-protocol oracle (r4 ask #8): sketch values differ across
    engines, so the query emits per-percentile `pXX_ok` = [the GK
    estimate lies between the exact interpolated percentiles at p +/-
    0.005, computed in the same plan] — accuracy=1000 documents rank
    error 0.001, so the 0.005 value-bracket is a 5x margin that also
    absorbs interpolation between ranks. The oracle asserts the same
    columns with ok=1, making the sketch bound a driver-hashable exact
    check; n stays an exact cross-engine value check.
    tests/test_operators.py additionally pins the raw rank-error bound."""
    (li,) = _t(spark, sf_dir, "lineitem")

    def ok(i: int) -> Column:
        return (
            (F.col("approx_p")[i] >= F.col("exact_p")[2 * i])
            & (F.col("approx_p")[i] <= F.col("exact_p")[2 * i + 1])
        ).cast("long")

    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 1000)"
            ).alias("approx_p"),
            F.expr(
                "percentile(l_extendedprice,"
                " array(0.495, 0.505, 0.895, 0.905, 0.985, 0.995))"
            ).alias("exact_p"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            "n",
            ok(0).alias("p50_ok"),
            ok(1).alias("p90_ok"),
            ok(2).alias("p99_ok"),
        )
    )


SQL_APPROX_QUANTILES = """
SELECT l_returnflag,
       COUNT(*) AS n,
       CAST(1 AS BIGINT) AS p50_ok,
       CAST(1 AS BIGINT) AS p90_ok,
       CAST(1 AS BIGINT) AS p99_ok
FROM lineitem GROUP BY l_returnflag
"""


SQL_QUANTILES = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99,
       MIN(l_extendedprice) AS pmin,
       MAX(l_extendedprice) AS pmax
FROM lineitem GROUP BY l_returnflag
"""


# --- cube grouping sets ----------------------------------------------------

def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            (F.expr("sum(cast(round(o_totalprice * 100) as bigint))") / 100.0).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


SQL_CUBE = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# --- ordered collect / string agg ------------------------------------------

def q_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, supp = _t(spark, sf_dir, "nation", "supplier")
    return (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("suppliers"),
            F.count("*").alias("n_suppliers"),
        )
    )


SQL_COLLECT_SORTED = """
SELECT n_name,
       string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
       COUNT(*) AS n_suppliers
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


# --- q9-like: product-line profit by nation and year -----------------------
# TPC-H q9 proper needs partsupp.ps_supplycost (absent from the driver
# tables); unit cost here is p_retailprice. Profit can be NEGATIVE per
# group, and Spark `div` (truncate toward zero) != DuckDB `//` (floor) on
# negatives — so the e4-cents sum is divided by 10000.0 in ONE float op in
# both engines (bit-identical: same bigint input, same IEEE divide).


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, supp, nation, orders, li = _t(
        spark, sf_dir, "part", "supplier", "nation", "orders", "lineitem"
    )
    profit_e4 = F.expr(
        "cast(round(l_extendedprice * 100) as bigint)"
        " * (100 - cast(round(l_discount * 100) as bigint))"
        " - cast(round(p_retailprice * 100) as bigint) * 100"
        "   * cast(l_quantity as bigint)"
    )
    return (
        li.join(
            F.broadcast(part.where(F.col("p_name").like("%widget%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg((F.sum(profit_e4) / 10000.0).alias("profit"))
    )


SQL_Q9_PRODUCT_PROFIT = """
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
              - CAST(ROUND(p_retailprice * 100) AS BIGINT) * 100
                * CAST(l_quantity AS BIGINT)) AS BIGINT) / 10000.0 AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
"""


# --- q12-like: late-shipment priority split --------------------------------
# TPC-H q12 groups by l_shipmode with commit/receipt-date lateness; the
# driver lineitem has neither, so the shape is kept (conditional counts of
# high- vs low-priority orders over a date-arithmetic band) with
# l_returnflag as the grouping column and ship lag = l_shipdate -
# o_orderdate. Dates are cast to DATE in both engines so day-diff
# semantics agree.


def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where((lag >= 30) & (lag <= 120))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


SQL_Q12_LATE_PRIORITY = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
      BETWEEN 30 AND 120
GROUP BY l_returnflag
"""


# --- ordered event funnel --------------------------------------------------
# Spark side is the PLAN THE ENGINE SHOULD RUN at scale: one shuffle
# (groupBy user), events folded in event-time order by a Catalyst
# `aggregate` lambda — no self-joins, no re-shuffling per step. The
# oracle states the same semantics the relational way (min-ts chain of
# strictly-later steps); results agree whenever a user has no duplicate
# event timestamps (held by the data; ties would differ only there).

_FUNNEL_STEPS = ("signup", "purchase", "error")


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    per_user = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts_ms", "event_id", "event_type"))
        ).alias("evs")
    )
    steps = F.array(*[F.lit(s) for s in _FUNNEL_STEPS])
    folded = per_user.select(
        F.aggregate(
            F.col("evs"),
            F.struct(
                F.lit(1).alias("stage"), F.lit(-(1 << 62)).cast("long").alias("last_ts")
            ),
            lambda acc, ev: F.when(
                (acc["stage"] <= len(_FUNNEL_STEPS))
                & (ev["event_type"] == F.element_at(steps, acc["stage"]))
                & (ev["ts_ms"] > acc["last_ts"]),
                F.struct(
                    (acc["stage"] + 1).alias("stage"), ev["ts_ms"].alias("last_ts")
                ),
            ).otherwise(acc),
        )["stage"].alias("stage")
    )
    return folded.agg(
        *[
            F.sum(F.when(F.col("stage") >= i + 2, 1).otherwise(0))
            .cast("long")
            .alias(f"n_step{i + 1}")
            for i in range(len(_FUNNEL_STEPS))
        ]
    )


SQL_EVENT_FUNNEL = """
WITH e AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events
),
s1 AS (SELECT user_id, MIN(ts_ms) AS t1 FROM e
       WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (SELECT e.user_id, MIN(ts_ms) AS t2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'purchase' AND ts_ms > t1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, MIN(ts_ms) AS t3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'error' AND ts_ms > t2 GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM s1) AS n_step1,
       (SELECT COUNT(*) FROM s2) AS n_step2,
       (SELECT COUNT(*) FROM s3) AS n_step3
"""


# --- q4-like: priority counts of orders with any late-shipped line ---------
# (no l_commitdate in the driver tables; "late" = shipped > 90 days after
# order date). EXISTS compiles to a left-semi join — the fact table never
# duplicates rows.


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    late = li.join(
        orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey")
    ).where(
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")) > 90
    ).select(F.col("l_orderkey").alias("late_ok")).distinct()
    return (
        orders.join(late, F.col("o_orderkey") == F.col("late_ok"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


SQL_Q4_ORDER_PRIORITY = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90
)
GROUP BY o_orderpriority
"""


# --- q6-like: forecast revenue change (selective scan-aggregate) -----------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.year("l_shipdate") == 1997)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (
                F.expr(
                    "sum(cast(round(l_extendedprice * 100) as bigint)"
                    " * cast(round(l_discount * 100) as bigint)) div 100"
                )
                / 100.0
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


SQL_Q6_FORECAST = """
SELECT (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) // 100) / 100.0
         AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --- q19-like: disjunctive bracket predicates (OR-of-ANDs join filter) ------


def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, li = _t(spark, sf_dir, "part", "lineitem")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    brackets = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 30))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 40))
    )
    return j.where(brackets).agg(
        (
            F.expr(
                "sum(cast(round(l_extendedprice * 100) as bigint)"
                " * (100 - cast(round(l_discount * 100) as bigint))) div 100"
            )
            / 100.0
        ).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


SQL_Q19_BRACKET = """
SELECT (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) // 100)
         / 100.0 AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size <= 20 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size <= 30 AND l_quantity BETWEEN 20 AND 40)
"""


# --- weekly cohort retention -----------------------------------------------
# Cohort = ISO week of a user's first event; retention counts users active
# again k weeks later. Two aggregations + one user-keyed join; weeks
# truncate identically (Monday) in both engines.


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    cohorts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    activity = (
        events.select("user_id", F.date_trunc("week", F.col("ts")).alias("w"))
        .distinct()
    )
    return (
        activity.join(cohorts, "user_id")
        .select(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(F.to_date("w"), F.to_date("cw")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
    )


SQL_COHORT_RETENTION = """
WITH cohorts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cw
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       date_diff('day', CAST(cw AS DATE), CAST(w AS DATE)) // 7 AS week_offset,
       COUNT(*) AS n_users
FROM activity JOIN cohorts USING (user_id)
GROUP BY 1, 2
"""


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill: per user, an hourly grid spanning
    the user's first to last event hour; each hour carries its last
    event's value ((ts, event_id)-max tie-break), and empty hours
    forward-fill the previous observation (last ignoreNulls window).

    Scale shape: one partial-agg shuffle to hourly buckets (the raw event
    table never enters the window), a per-user grid exploded from a
    2-row-per-user span table, then one window keyed the same as the
    bucket shuffle. Grid rows = users x active hours, << raw events."""
    (events,) = _t(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        "event_id",
        "value",
        F.col("ts").cast("timestamp").alias("ts"),
        F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h"),
    )
    buckets = e.groupBy("user_id", "h").agg(
        F.max_by("value", F.struct("ts", "event_id")).alias("v")
    )
    grid = (
        buckets.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(h0, h1, interval 1 hour)")).alias("h"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(buckets, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.unix_millis("h").alias("hour_ms"),
            F.col("v").isNotNull().cast("long").alias("observed"),
            F.last("v", ignorenulls=True).over(w).alias("filled"),
        )
    )


SQL_RESAMPLE_FFILL = """
WITH b AS (
  SELECT user_id, h, value AS v FROM (
    SELECT user_id, date_trunc('hour', ts) AS h, value,
           ROW_NUMBER() OVER (
             PARTITION BY user_id, date_trunc('hour', ts)
             ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
),
spans AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM b GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM spans
)
SELECT g.user_id, epoch_ms(g.h) AS hour_ms,
       CAST(b.v IS NOT NULL AS BIGINT) AS observed,
       LAST_VALUE(b.v IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.h = b.h
"""


def q_scd2_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) build: collapse each user's
    event_type history into validity intervals — one row per change,
    [valid_from, valid_to) in epoch ms, open intervals as -1. The
    change-detect lag and the valid_to lead share one (user) window
    partitioning, so the whole build is a single shuffle."""
    (events,) = _t(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    changes = e.withColumn("prev", F.lag("event_type").over(w)).where(
        F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return (
        changes.select(
            "user_id", "event_id", "event_type",
            F.col("ts_ms").alias("valid_from"),
        )
        .select(
            "user_id",
            "event_type",
            "valid_from",
            F.coalesce(F.lead("valid_from").over(w2), F.lit(-1)).alias("valid_to"),
        )
    )


SQL_SCD2_USER_TYPE = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms FROM events
),
changes AS (
  SELECT user_id, event_id, event_type, ts_ms AS valid_from
  FROM (
    SELECT *, LAG(event_type) OVER (
      PARTITION BY user_id ORDER BY ts_ms, event_id) AS prev
    FROM e
  ) WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id, event_type, valid_from,
       COALESCE(LEAD(valid_from) OVER (
         PARTITION BY user_id ORDER BY valid_from, event_id), -1) AS valid_to
FROM changes
"""


# --- remaining TPC-H shapes (q13/q14/q17/q18/q22, fixture-adapted:
# no partsupp/phone/comment/receiptdate columns exist) ----------------------


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13 shape: customers x their order count, then the distribution of
    order counts (two cascaded aggs off one left join; the second agg's
    input is customer-sized, not order-sized)."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    # aggregate orders BEFORE the join: the join then moves one count per
    # customer instead of every order row (the oracle SQL keeps the
    # textbook join-then-agg formulation; results are identical)
    counts = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("c_count")
    )
    per_cust = cust.join(counts, "c_custkey", "left").select(
        F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


SQL_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q14 shape: promo revenue share over one ship-month. Conditional sum
    over exact cents; only the final ratio is floating (bit-identical
    single division, floor-scaled)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    rc = F.expr(
        "sum(cast(round(l_extendedprice*100) as long)"
        " * (100 - cast(round(l_discount*100) as long)))"
    )
    promo = F.expr(
        "sum(case when p_type = 'PROMO' then"
        " cast(round(l_extendedprice*100) as long)"
        " * (100 - cast(round(l_discount*100) as long)) else 0 end)"
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.floor(F.lit(100.0) * promo / rc * 1000000) / 1000000).alias(
                "promo_share"
            )
        )
    )


SQL_Q14 = """
SELECT FLOOR(100.0 *
         SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(ROUND(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(ROUND(l_discount*100) AS BIGINT)) ELSE 0 END)
         / SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
               * (100 - CAST(ROUND(l_discount*100) AS BIGINT)))
         * 1000000) / 1000000 AS promo_share
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q17 shape: revenue from small-quantity lines of one brand. The
    bracket `qty < 0.2 * avg(qty per part)` decides row MEMBERSHIP, so it
    is rearranged to exact integers (5*qty*cnt < sum_qty) — no float
    boundary can flip a row between engines. Per-part stats join
    broadcast (part-sized, not line-sized)."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    qty = F.col("l_quantity").cast("long")
    stats = (
        li.groupBy("l_partkey")
        .agg(F.sum(qty).alias("sum_qty"), F.count("*").alias("cnt"))
    )
    pc = F.expr("cast(round(l_extendedprice*100) as long)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .where(F.col("p_brand") == "Brand#1")
        .join(F.broadcast(stats), "l_partkey")
        .where(5 * qty * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (F.floor(F.sum(pc) / 100.0 / 7.0 * 10000) / 10000).alias("avg_yearly")
        )
    )


SQL_Q17 = """
WITH stats AS (
  SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY l_partkey
)
SELECT FLOOR(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / 100.0 / 7.0
             * 10000) / 10000 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN stats USING (l_partkey)
WHERE p_brand = 'Brand#1'
  AND 5 * CAST(l_quantity AS BIGINT) * cnt < sum_qty
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q18 shape: orders whose total quantity exceeds a threshold, with
    customer context. The HAVING membership is an exact integer sum; the
    order-sized filtered key set then drives semi-style joins."""
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    qty = F.col("l_quantity").cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("sum_qty"))
        .where(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
                "order_date_ms"
            ),
            "o_totalprice",
            "sum_qty",
        )
    )


SQL_Q18 = """
SELECT c_name, c_custkey, o_orderkey, epoch_ms(o_orderdate) AS order_date_ms,
       o_totalprice, sum_qty
FROM (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum_qty > 250
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q22 shape: wealthy-but-idle customers per nation — balance above
    the positive-balance average AND no orders after a cutoff. The
    average-balance membership compares exact cents (bal*cnt > sum), the
    idle check is a broadcast-able anti join against recent orders."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    bal = F.expr("cast(round(c_acctbal*100) as long)")
    avg_pos = (
        cust.where(bal > 0)
        .agg(F.sum(bal).alias("sum_pos"), F.count("*").alias("n_pos"))
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz")
    ).select(F.col("o_custkey").alias("c_custkey"))
    return (
        cust.withColumn("bal_cents", bal)
        .crossJoin(F.broadcast(avg_pos))
        .where(F.col("bal_cents") * F.col("n_pos") > F.col("sum_pos"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_custs"),
            (F.sum("bal_cents") / 100.0).alias("total_acctbal"),
        )
    )


SQL_Q22 = """
WITH avg_pos AS (
  SELECT SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS sum_pos,
         COUNT(*) AS n_pos
  FROM customer WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) > 0
),
recent AS (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_orderdate >= TIMESTAMP '1999-01-01'
)
SELECT c_nationkey, COUNT(*) AS n_custs,
       SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) / 100.0 AS total_acctbal
FROM customer CROSS JOIN avg_pos
WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) * n_pos > sum_pos
  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
GROUP BY c_nationkey
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11 shape, fixture-adapted: parts holding an outsized share of one
    nation's supply value. No partsupp exists, so supply value is the
    lineitem extended price (exact cents) shipped by that nation's
    suppliers. The HAVING `value > total/5000` fraction test is
    rearranged to integers (value*5000 > total) so no float boundary can
    flip membership. The nation's supplier set broadcasts into the
    lineitem scan; the grand total broadcasts into the per-part agg."""
    li, supp, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    nat_supp = (
        supp.join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_1")),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    scoped = li.join(F.broadcast(nat_supp), "l_suppkey", "left_semi")
    per_part = scoped.groupBy("l_partkey").agg(
        F.expr("sum(cast(round(l_extendedprice*100) as long))").alias("value_cents")
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(F.col("value_cents") * 5000 > F.col("total_cents"))
        .select("l_partkey", (F.col("value_cents") / 100.0).alias("supply_value"))
    )


SQL_Q11 = """
WITH scoped AS (
  SELECT l_partkey, CAST(ROUND(l_extendedprice*100) AS BIGINT) AS cents
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1')
),
per_part AS (
  SELECT l_partkey, SUM(cents) AS value_cents FROM scoped GROUP BY l_partkey
)
SELECT l_partkey, value_cents / 100.0 AS supply_value
FROM per_part
WHERE value_cents * 5000 > (SELECT SUM(value_cents) FROM per_part)
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q15 shape: supplier(s) with the maximum quarterly revenue. Revenue
    per supplier in exact cents; the max-membership test compares those
    integers, so ties and boundaries are engine-independent. The
    supplier-sized revenue relation joins broadcast both to its own max
    and to the supplier dim."""
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    cents = F.expr(
        "sum(cast(round(l_extendedprice*100) as long)"
        " * (100 - cast(round(l_discount*100) as long)))"
    )
    rev = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(cents.alias("rev_cents"))
    )
    top = rev.agg(F.max("rev_cents").alias("max_cents"))
    return (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_cents") / 10000.0).alias("total_revenue"),
        )
    )


SQL_Q15 = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_cents / 10000.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_cents = (SELECT MAX(rev_cents) FROM rev)
"""


def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16 shape, fixture-adapted: supplier count per (brand, type, size
    bucket) for parts outside one brand, excluding flagged suppliers.
    The fixtures have no partsupp table, so the part-supplier relation is
    DISTINCT (l_partkey, l_suppkey) observed in lineitem; 'complaint'
    suppliers are the negative-balance ones. The exclusion list and the
    part dim both broadcast; the only big shuffle is the distinct over
    the pair relation."""
    li, part, supp = _t(spark, sf_dir, "lineitem", "part", "supplier")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    bad = supp.where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    parts = part.where(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 25)
    )
    return (
        pairs.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(parts), pairs.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size <= 25
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q20_excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20 shape, fixture-adapted: suppliers in one nation who moved a
    large volume of PROMO-type parts during 1997. The reference shape's
    nested part→partsupp→lineitem semi-join chain becomes part-filter →
    per-(part,supplier) shipped-qty agg → HAVING on an exact integer sum
    → semi join into the supplier dim. Part dim broadcasts into the
    lineitem scan; the qualifying pair set broadcasts into supplier."""
    li, part, supp, nation = _t(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    promo = part.where(F.col("p_type") == "PROMO").select("p_partkey")
    qual = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .join(F.broadcast(promo), li.l_partkey == promo.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .where(F.col("sum_qty") > 30)
        .select(F.col("l_suppkey").alias("s_suppkey"))
        .distinct()
    )
    return (
        supp.join(F.broadcast(qual), "s_suppkey", "left_semi")
        .join(
            F.broadcast(nation.where(F.col("n_name") == "NATION_1")),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )


SQL_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_partkey, l_suppkey
    HAVING SUM(CAST(l_quantity AS BIGINT)) > 30
  )
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21 shape, fixture-adapted: suppliers who alone held up a
    multi-supplier order. No receipt/commit dates exist, so 'late' is
    l_shipdate > o_orderdate + 60 days on finalized orders. The
    reference's exists/not-exists self-joins on lineitem collapse into
    one per-(order,supplier) aggregate plus one per-order window — the
    order's supplier count and late-supplier count come from the window,
    so lineitem is shuffled twice (pair agg, then order window) instead
    of three self-join passes."""
    li, orders, supp = _t(spark, sf_dir, "lineitem", "orders", "supplier")
    fin = orders.where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    pair = (
        li.join(F.broadcast(fin), li.l_orderkey == fin.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
                ).cast("int")
            ).alias("has_late")
        )
    )
    w = Window.partitionBy("l_orderkey")
    return (
        pair.withColumn("n_supps", F.count("*").over(w))
        .withColumn("n_late", F.sum("has_late").over(w))
        .where(
            (F.col("has_late") == 1)
            & (F.col("n_supps") >= 2)
            & (F.col("n_late") == 1)
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
    )


SQL_Q21 = """
WITH pair AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
             THEN 1 ELSE 0 END) AS has_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
flagged AS (
  SELECT l_suppkey, has_late,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supps,
         SUM(has_late) OVER (PARTITION BY l_orderkey) AS n_late
  FROM pair
)
SELECT s_name, COUNT(*) AS numwait
FROM flagged JOIN supplier ON l_suppkey = s_suppkey
WHERE has_late = 1 AND n_supps >= 2 AND n_late = 1
GROUP BY s_name
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube, both also
    in the suite): per-status, per-priority, and grand-total aggregates in
    one pass — one shuffle, the expand operator fans each row into its
    member sets map-side."""
    (orders,) = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / CAST(100 AS DOUBLE)
                 AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


SQL_GROUPING_SETS = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def q_scalar_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order scalar functions (transform, filter, sort,
    slice, distinct, contains, index) over a derived token array —
    per-row Column math, zero shuffles. The token array is materialized
    in a prior projection (an inline array inside a lambda re-evaluates
    per element)."""
    from spdb_spark.functions.text import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    staged = docs.where(F.col("doc_id") % 11 == 0).select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    return staged.select(
        "doc_id",
        F.size("toks").cast("long").alias("n"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.array_join(F.slice(F.array_sort("toks"), 1, 3), ",").alias("first3_sorted"),
        F.array_contains("toks", "table").cast("int").cast("long").alias("has_table"),
        F.size(F.filter("toks", lambda t: F.length(t) > 4)).cast("long").alias(
            "n_long_toks"
        ),
        F.array_join(
            F.slice(F.transform("toks", lambda t: F.upper(t)), 1, 2), ","
        ).alias("first2_upper"),
        F.array_position(F.array_sort("toks"), "value").cast("long").alias(
            "pos_value_sorted"
        ),
    )


SQL_SCALAR_ARRAYS = f"""
WITH staged AS (
  SELECT doc_id, {{toks}} AS toks FROM documents WHERE doc_id % 11 = 0
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       array_to_string(list_sort(toks)[1:3], ',') AS first3_sorted,
       CAST(list_contains(toks, 'table') AS BIGINT) AS has_table,
       CAST(len(list_filter(toks, t -> length(t) > 4)) AS BIGINT) AS n_long_toks,
       array_to_string(list_transform(toks, t -> upper(t))[1:2], ',')
         AS first2_upper,
       CAST(COALESCE(list_position(list_sort(toks), 'value'), 0) AS BIGINT)
         AS pos_value_sorted
FROM staged
""".format(toks="regexp_split_to_array(lower(trim(text)), '\\s+')")



def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's irregularly sampled series
    (left-continuous step interpolation, the hypertable-rollup classic):
    sum(value * dt) / sum(dt) with dt from ONE user-keyed lead window.
    Users with a single sample (zero span) are excluded."""
    (events,) = _t(spark, sf_dir, "events")
    e = events.select(
        "user_id",
        "event_id",
        "value",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    seg = e.withColumn("dt", F.lead("ts_ms").over(w) - F.col("ts_ms"))
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum(F.col("value") * F.col("dt")).alias("wsum"),
            F.sum("dt").alias("span"),
        )
        .where(F.col("span") > 0)
        .select(
            "user_id",
            (F.floor(F.col("wsum") / F.col("span") * 1000000) / 1000000).alias(
                "twa"
            ),
        )
    )


SQL_TIME_WEIGHTED_AVG = """
WITH e AS (
  SELECT user_id, event_id, value, epoch_ms(ts) AS ts_ms FROM events
),
seg AS (
  SELECT user_id, value,
         LEAD(ts_ms) OVER (
           PARTITION BY user_id ORDER BY ts_ms, event_id) - ts_ms AS dt
  FROM e
)
SELECT user_id,
       FLOOR(SUM(value * dt) / SUM(dt) * 1000000) / 1000000 AS twa
FROM seg
GROUP BY user_id
HAVING SUM(dt) > 0
"""

QUERIES = {
    "q_resample_ffill": (q_resample_ffill, SQL_RESAMPLE_FFILL),
    "q_scd2_user_type": (q_scd2_user_type, SQL_SCD2_USER_TYPE),
    "q13_order_count_distribution": (q13_order_count_distribution, SQL_Q13),
    "q14_promo_share": (q14_promo_share, SQL_Q14),
    "q17_small_qty_revenue": (q17_small_qty_revenue, SQL_Q17),
    "q18_large_orders": (q18_large_orders, SQL_Q18),
    "q22_idle_customers": (q22_idle_customers, SQL_Q22),
    "q11_important_stock": (q11_important_stock, SQL_Q11),
    "q15_top_supplier": (q15_top_supplier, SQL_Q15),
    "q16_supplier_count_by_part": (q16_supplier_count_by_part, SQL_Q16),
    "q20_excess_volume_suppliers": (q20_excess_volume_suppliers, SQL_Q20),
    "q21_waiting_suppliers": (q21_waiting_suppliers, SQL_Q21),
    "q1_pricing_summary": (q1_pricing_summary, SQL_Q1),
    "q_cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
    "q9_product_profit": (q9_product_profit, SQL_Q9_PRODUCT_PROFIT),
    "q12_late_priority": (q12_late_priority, SQL_Q12_LATE_PRIORITY),
    "q4_order_priority": (q4_order_priority, SQL_Q4_ORDER_PRIORITY),
    "q6_forecast_revenue": (q6_forecast_revenue, SQL_Q6_FORECAST),
    "q19_bracket_revenue": (q19_bracket_revenue, SQL_Q19_BRACKET),
    "q_event_funnel": (q_event_funnel, SQL_EVENT_FUNNEL),
    "q2_min_cost_supplier": (q2_min_cost_supplier, SQL_Q2_MIN_COST),
    "q7_nation_volume": (q7_nation_volume, SQL_Q7_NATION_VOLUME),
    "q8_brand_share": (q8_brand_share, SQL_Q8_BRAND_SHARE),
    "q10_returned_revenue": (q10_returned_revenue, SQL_Q10_RETURNED),
    "q_quantiles": (q_quantiles, SQL_QUANTILES),
    "q_approx_quantiles": (q_approx_quantiles, SQL_APPROX_QUANTILES),
    "q_cube": (q_cube, SQL_CUBE),
    "q_collect_sorted": (q_collect_sorted, SQL_COLLECT_SORTED),
    "q3_top_orders": (q3_top_orders, SQL_Q3),
    "q5_region_revenue": (q5_region_revenue, SQL_Q5),
    "q_semi_join": (q_semi_join, SQL_SEMI_JOIN),
    "q_anti_join": (q_anti_join, SQL_ANTI_JOIN),
    "q_window_topk": (q_window_topk, SQL_WINDOW_TOPK),
    "q_event_running": (q_event_running, SQL_EVENT_RUNNING),
    "q_sessionize": (q_sessionize, SQL_SESSIONIZE),
    "q_time_weighted_avg": (q_time_weighted_avg, SQL_TIME_WEIGHTED_AVG),
    "q_rollup": (q_rollup, SQL_ROLLUP),
    "q_distinct_agg": (q_distinct_agg, SQL_DISTINCT_AGG),
    "q_setops": (q_setops, SQL_SETOPS),
    "q_asof_join": (q_asof_join, SQL_ASOF_JOIN),
    "q_range_join": (q_range_join, SQL_RANGE_JOIN),
    "q_json_extract": (q_json_extract, SQL_JSON_EXTRACT),
    "q_sliding_window": (q_sliding_window, SQL_SLIDING_WINDOW),
    "q_above_brand_avg": (q_above_brand_avg, SQL_ABOVE_BRAND_AVG),
    "q_scalar_string_math": (q_scalar_string_math, SQL_SCALAR_STRING_MATH),
    "q_scalar_dates": (q_scalar_dates, SQL_SCALAR_DATES),
    "q_pivot_status": (q_pivot_status, SQL_PIVOT_STATUS),
    "q_scalar_arrays": (q_scalar_arrays, SQL_SCALAR_ARRAYS),
    "q_grouping_sets": (q_grouping_sets, SQL_GROUPING_SETS),
}
