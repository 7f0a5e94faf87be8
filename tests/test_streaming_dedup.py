"""Streaming dedup: a replayed source must produce exactly one output row
per key, matching batch dropDuplicates on the same input."""

import datetime

from spdb_spark.streaming.dedup import dedup_stream


def _rows_with_replays():
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(60):
        ts = base + datetime.timedelta(minutes=i)
        rows.append((i, ts, f"u{i % 7}", float(i)))
        if i % 3 == 0:  # upstream at-least-once: every third event replays
            rows.append((i, ts, f"u{i % 7}", float(i)))
    return rows


def test_stream_dedup_matches_batch(spark, tmp_path):
    src = tmp_path / "dedup_src"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id string, value double"
    df = spark.createDataFrame(_rows_with_replays(), schema)
    df.coalesce(1).write.parquet(str(src / "p1"))

    batch_keys = {r.event_id for r in dedup_stream(df).collect()}
    assert len(batch_keys) == 60  # batch path dropped all replays

    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    out = dedup_stream(stream, watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM dedup_out").collect()

    assert len(streamed) == 60  # one row per key, replays dropped
    assert {r.event_id for r in streamed} == batch_keys
    # dedup keeps full rows, not just keys
    vals = {r.event_id: r.value for r in streamed}
    assert vals[9] == 9.0
