"""Stream-stream joins with watermarks — the remaining Structured Streaming
operator class: correlate two live streams within a bounded event-time
window (state expires past the watermark, so state size is bounded by
rate x window, not stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_purchases_to_clicks(
    purchases: DataFrame,
    clicks: DataFrame,
    max_gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Attribute each purchase to click(s) by the same user within the
    preceding `max_gap_minutes` (classic attribution join).

    On streams both sides get watermarks and the time-range condition
    bounds the join state; the identical expression runs on batch frames
    (used by tests to cross-check results).
    """
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("c_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_gap_minutes} MINUTES"))
    )
    return p.join(c, cond, "inner").select(
        F.col("p_user").alias("user_id"), "purchase_id", "click_id", "p_ts", "c_ts"
    )
