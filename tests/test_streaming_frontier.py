"""StreamingFrontier (streaming/frontier.py): schedule reads equal the
batch frontier_schedule over the distinct union for any arrival order,
rediscovered URLs never get a second slot, late-arriving smaller
carrier rows displace earlier ones, redelivery is a no-op, and
compaction preserves state. StreamingRobots closes the loop: the
schedule computed from STREAMED robots fetches equals the batch
schedule from the batch crawl-delay table, any arrival order of either
stream."""

from pyspark.sql import functions as F

from spdb_spark.sources.frontier import frontier_schedule
from spdb_spark.streaming.frontier import StreamingFrontier, StreamingRobots

SCHEMA = "doc_id long, url string"


def _drive(spark, tmp_path, tag, batches):
    import os

    feed = tmp_path / f"feed_{tag}"
    feed.mkdir()
    for j, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            str(feed / f"f{j}")
        )
    sink = StreamingFrontier(
        spark, str(tmp_path / f"state_{tag}"), SCHEMA, url_col="url"
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed / "*"))
    )
    q = sink.start(stream, str(tmp_path / f"ckpt_{tag}"))
    assert q.awaitTermination(300)
    return sink


def test_stream_schedule_equals_batch_any_order(spark, tmp_path):
    rows = [(i, f"http://h{i % 3}.example/p{i * 7 % 23}") for i in range(21)]
    # rediscoveries with LARGER doc_ids (must not displace or double-slot)
    dups = [(100 + i, u) for i, u in rows[::4]]
    # one rediscovery with a SMALLER doc_id: displaces at read time
    rows_nodisp = [r for r in rows if r[0] != 7]
    late_small = (0 - 1, rows[7][1])  # doc_id -1 for url of row 7

    a = _drive(
        spark, tmp_path, "ab", [rows[:10], rows[10:] + dups, [late_small]]
    )
    b = _drive(
        spark, tmp_path, "ba", [[late_small] + dups, rows[10:], rows[:10]]
    )
    delays = spark.createDataFrame(
        [("h0.example", 0.5), ("h1.example", 3.0)],
        "host string, delay_s double",
    )
    union = spark.createDataFrame(
        rows + dups + [late_small], SCHEMA
    )
    canon = (
        union.groupBy("url")
        .agg(F.min(F.struct("doc_id", "url")).alias("_s"))
        .select("_s.*")
    )
    want = {
        tuple(r)
        for r in frontier_schedule(
            canon, delays, default_delay_s=2.0, start_s=10.0
        ).collect()
    }
    for sink in (a, b):
        got = {
            tuple(r)
            for r in sink.schedule(
                delays, default_delay_s=2.0, start_s=10.0
            ).collect()
        }
        assert got == want
    # the displaced url is carried by doc_id -1, never by 7 or its dup
    carriers = {r[0] for r in want if r[1] == rows[7][1]}
    assert carriers == {-1}
    # one slot per distinct url
    assert len(want) == len({r[1] for r in want})

    # redelivery of a committed batch id is a no-op
    before = {tuple(r) for r in a.urls().collect()}
    a.process_batch(
        spark.createDataFrame([(999, "http://x.example/z")], SCHEMA),
        a._committed()[-1],
    )
    assert {tuple(r) for r in a.urls().collect()} == before

    # compaction preserves the canonical frontier
    a.compact()
    a.vacuum()
    assert {tuple(r) for r in a.urls().collect()} == before


RB_SCHEMA = "host string, robots_txt string"


def _drive_robots(spark, tmp_path, tag, batches):
    feed = tmp_path / f"rbfeed_{tag}"
    feed.mkdir()
    for j, rows in enumerate(batches):
        spark.createDataFrame(rows, RB_SCHEMA).coalesce(1).write.parquet(
            str(feed / f"f{j}")
        )
    sink = StreamingRobots(spark, str(tmp_path / f"rbstate_{tag}"))
    stream = (
        spark.readStream.schema(RB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed / "*"))
    )
    q = sink.start(stream, str(tmp_path / f"rbckpt_{tag}"))
    assert q.awaitTermination(300)
    return sink


def test_streamed_robots_schedule_equals_batch(spark, tmp_path):
    """The composed loop: frontier URLs AND robots fetches both arrive
    as streams; schedule(robots.crawl_delays(agent)) must equal the
    batch frontier_schedule over the batch robots_crawl_delays, for any
    arrival order of either stream (including a host refetched in a
    later batch, which must not yield a second delay row)."""
    from spdb_spark.functions.robots import robots_crawl_delays

    urls = [(i, f"http://h{i % 4}.example/p{i * 5 % 17}") for i in range(24)]
    rb_rows = [
        ("h0.example", "User-agent: mybot\nCrawl-delay: 0.5\n"),
        ("h1.example", "User-agent: *\nCrawl-delay: 3\n"),
        ("h2.example", "User-agent: mybot\nCrawl-delay: soon\n"),
        # h3.example: never fetched -> default delay
    ]
    refetch = [("h0.example", "User-agent: mybot\nCrawl-delay: 0.5\n")]

    fr = _drive(spark, tmp_path, "rb", [urls[:12], urls[12:]])
    r1 = _drive_robots(
        spark, tmp_path, "o1", [rb_rows[:2], rb_rows[2:] + refetch]
    )
    r2 = _drive_robots(
        spark, tmp_path, "o2", [refetch + rb_rows[2:], rb_rows[:2]]
    )

    batch_rb = spark.createDataFrame(rb_rows, RB_SCHEMA)
    want = {
        tuple(r)
        for r in frontier_schedule(
            spark.createDataFrame(urls, SCHEMA),
            robots_crawl_delays(batch_rb, "mybot"),
            default_delay_s=2.0,
            start_s=10.0,
        ).collect()
    }
    for rb in (r1, r2):
        delays = {tuple(r) for r in rb.crawl_delays("mybot").collect()}
        # the malformed h2 delay drops the host; refetch adds no row
        assert delays == {("h0.example", 0.5), ("h1.example", 3.0)}
        got = {
            tuple(r)
            for r in fr.schedule(
                rb.crawl_delays("mybot"), default_delay_s=2.0, start_s=10.0
            ).collect()
        }
        assert got == want

    # the sitemap side-channel reads equal the batch operator too
    sm_rows = [
        ("s.example", "Sitemap: http://s.example/a.xml\nUser-agent: *\n"),
    ]
    r3 = _drive_robots(spark, tmp_path, "o3", [sm_rows, sm_rows])
    assert {tuple(r) for r in r3.sitemaps().collect()} == {
        ("s.example", "http://s.example/a.xml")
    }
