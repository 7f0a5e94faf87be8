"""Event-time windowed aggregation: streaming output must equal the batch
computation of the same transformation (Spark's unified semantics)."""

import datetime

from spdb_spark.streaming.windows import windowed_event_stats


def _rows():
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(100):
        rows.append(
            (base + datetime.timedelta(minutes=7 * i), "click" if i % 2 else "view", float(i))
        )
    return rows


def test_streaming_windows_match_batch(spark, tmp_path):
    src = tmp_path / "events_src"
    src.mkdir()
    df = spark.createDataFrame(_rows(), "ts timestamp, event_type string, value double")
    df.write.parquet(str(src / "p1"))

    batch = windowed_event_stats(df, window="1 hour").collect()

    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    out = windowed_event_stats(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM win_out").collect()

    key = lambda r: (r.window_start, r.event_type)  # noqa: E731
    assert {key(r): (r.n, r.sum_value) for r in streamed} == {
        key(r): (r.n, r.sum_value) for r in batch
    }
    assert len(batch) > 10
