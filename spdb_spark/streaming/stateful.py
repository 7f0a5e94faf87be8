"""Custom stateful streaming operator: per-user session tracking via
applyInPandasWithState — the escape hatch for stream semantics the built-in
windowed aggregations can't express (session windows with per-key custom
state and timeout-driven emission).

Batch-mode equivalence: `sessionize_batch` computes the same sessions with
windows (used to cross-check results in tests)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_MS = 30 * 60 * 1000

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start_ms", LongType(), False),
        StructField("session_end_ms", LongType(), False),
        StructField("n_events", LongType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType(), True),
        StructField("last_ms", LongType(), True),
        StructField("n", LongType(), True),
    ]
)


def _update_sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """State update: extend the open session or close it and start a new one
    when the gap exceeds SESSION_GAP_MS. Emits closed sessions."""
    (user_id,) = key
    if state.exists:
        start_ms, last_ms, n = state.get
    else:
        start_ms = last_ms = None
        n = 0
    closed = []
    ts_all = []
    for pdf in pdfs:
        ts_all.extend(pdf["ts_ms"].tolist())
    for ts in sorted(ts_all):
        if last_ms is None:
            start_ms, last_ms, n = ts, ts, 1
        elif ts - last_ms > SESSION_GAP_MS:
            closed.append((user_id, start_ms, last_ms, n))
            start_ms, last_ms, n = ts, ts, 1
        else:
            last_ms = ts
            n += 1
    state.update((start_ms, last_ms, n))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_ms", "session_end_ms", "n_events"]
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events(user_id long, ts_ms long) stream -> closed-session rows."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_batch(events: DataFrame) -> DataFrame:
    """Batch reference: same sessions via gaps-and-islands windows. Returns
    ALL sessions (a stream emits only closed ones — the final open session
    per user stays in state)."""
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    flagged = events.withColumn(
        "new_s",
        F.when(F.col("ts_ms") - F.lag("ts_ms").over(w) > SESSION_GAP_MS, 1).otherwise(0),
    ).withColumn(
        "sid", F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return flagged.groupBy("user_id", "sid").agg(
        F.min("ts_ms").alias("session_start_ms"),
        F.max("ts_ms").alias("session_end_ms"),
        F.count("*").alias("n_events"),
    ).drop("sid")
