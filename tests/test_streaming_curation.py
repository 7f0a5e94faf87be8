"""Streaming curation: the windowed mixture monitor must produce the same
final rows as the batch expression on the same input, and the quality
stage must be stateless-identical between batch and streaming."""

import datetime

from spdb_spark.streaming.curation import mixture_monitor, quality_stream


def _doc_rows():
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(90):
        ts = base + datetime.timedelta(minutes=i)
        rows.append((i, ts, f"src{i % 3}", "tok " * (3 + i % 5)))
    return rows


SCHEMA = "doc_id long, ts timestamp, source string, text string"


def test_mixture_monitor_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "docs_src"
    src.mkdir()
    df = spark.createDataFrame(_doc_rows(), SCHEMA)
    df.coalesce(1).write.parquet(str(src / "p1"))

    batch = {
        (r.win_start, r.domain): (r.n_docs, r.tokens)
        for r in mixture_monitor(df).collect()
    }
    assert len(batch) == 9 * 3  # 90 min / 10-min windows x 3 sources

    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    q = (
        mixture_monitor(stream)
        .writeStream.format("memory")
        .queryName("mix_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.win_start, r.domain): (r.n_docs, r.tokens)
        for r in spark.sql("SELECT * FROM mix_out").collect()
    }
    assert streamed == batch


def test_quality_stream_stateless_parity(spark, tmp_path):
    src = tmp_path / "docs_q"
    src.mkdir()
    df = spark.createDataFrame(_doc_rows(), SCHEMA)
    df.coalesce(1).write.parquet(str(src / "p1"))

    batch = {r.doc_id: (r.n_tokens, r.quality) for r in quality_stream(df).collect()}

    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    q = (
        quality_stream(stream)
        .writeStream.format("memory")
        .queryName("q_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.doc_id: (r.n_tokens, r.quality)
        for r in spark.sql("SELECT * FROM q_out").collect()
    }
    assert streamed == batch


def test_curate_crawl_stream_stateless_parity(spark, tmp_path):
    """C4 + Gopher + eTLD+1 on a stream: pure projections, identical to
    batch row-for-row, zero state (no aggregation in the plan)."""
    from spdb_spark.streaming.curation import curate_crawl_stream

    src = tmp_path / "docs_c"
    src.mkdir()
    rows = [
        (i, f"http://sub{i % 4}.site{i % 3}.co.uk/p{i}",
         ("We agreed to publish the full report today. " * (1 + i % 3))
         + ("Short bit" if i % 5 == 0 else "Every line ends cleanly."))
        for i in range(60)
    ]
    schema = "doc_id long, source string, text string"
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.parquet(str(src / "p1"))

    batch = {
        r.doc_id: (r.c4_keep, r.gopher_keep, r.domain)
        for r in curate_crawl_stream(df).collect()
    }
    assert any(v[2] == "site0.co.uk" for v in batch.values())

    stream = spark.readStream.schema(df.schema).parquet(str(src / "*"))
    out = curate_crawl_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("crawl_curate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r.doc_id: (r.c4_keep, r.gopher_keep, r.domain)
        for r in spark.sql("SELECT * FROM crawl_curate_out").collect()
    }
    assert streamed == batch
