"""Streaming WARC ingest (streaming/crawl.py): stream == batch document
rows, incremental second file, and exactly-once on restart (no
reprocessing of already-consumed WARC files)."""

from spdb_spark.sources.warc import warc_encode


def _warc_bytes(tag: str, n: int) -> bytes:
    recs = []
    for i in range(n):
        prose = (f"The {tag} pipeline processed batch {i} with steady "
                 "results and the crawl continued through the night.")
        page = f"<html><body><p>{prose}</p></body></html>"
        recs.append({
            "warc_type": "response",
            "target_uri": f"http://{tag}.example/p{i}?utm_source=f",
            "payload": ("HTTP/1.1 200 OK\r\n\r\n" + page).encode(),
        })
    recs.append({
        "warc_type": "request",
        "target_uri": f"http://{tag}.example/p0",
        "payload": b"GET /p0",
    })
    return warc_encode(recs)


def _drain(spark, out, sink, checkpoint):
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_matches_batch_then_increments(spark, tmp_path):
    from spdb_spark.sources.warc import ingest_warc, warc_responses_to_docs
    from spdb_spark.streaming.crawl import stream_crawl_docs

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.warc.gz").write_bytes(_warc_bytes("alpha", 5))

    batch = {
        r["doc_id"]: (r["text"], r["source"], r["n_chars"])
        for r in warc_responses_to_docs(
            ingest_warc(spark, str(feed)),
            main_content=True,
            normalize_urls=True,
            dedup=False,
        ).collect()
    }
    assert len(batch) == 5  # request record filtered
    assert all("utm_source" not in v[1] for v in batch.values())

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    _drain(spark, stream_crawl_docs(spark, str(feed)), sink, ckpt)
    streamed = {
        r["doc_id"]: (r["text"], r["source"], r["n_chars"])
        for r in spark.read.parquet(sink).collect()
    }
    assert streamed == batch

    # a second file arrives: a restarted query appends exactly ITS docs
    (feed / "b.warc.gz").write_bytes(_warc_bytes("beta", 3))
    _drain(spark, stream_crawl_docs(spark, str(feed)), sink, ckpt)
    after = {
        r["doc_id"]: r["source"] for r in spark.read.parquet(sink).collect()
    }
    assert len(after) == 8  # 5 + 3, no duplicates of the first file
    assert sum("beta" in s for s in after.values()) == 3

    # a third drain with nothing new is a no-op
    _drain(spark, stream_crawl_docs(spark, str(feed)), sink, ckpt)
    assert spark.read.parquet(sink).count() == 8
