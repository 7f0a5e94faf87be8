"""Streaming windowed aggregation with watermarks — the Structured
Streaming operator surface for the events stream (tumbling/sliding
event-time windows, late-data handling).

Identical transformations work on batch DataFrames (Spark's unified
model), which is how the tests cross-check streaming output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "6 hours",
    slide: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling (or sliding) event-time window aggregation per event_type
    with a watermark bounding state for late data."""
    e = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    win = (
        F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    )
    return (
        e.groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )
