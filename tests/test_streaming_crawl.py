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


def test_streaming_crawl_corpus_matches_batch(spark, tmp_path):
    """The full composition: a WARC feed split across files/micro-batches
    must yield, via StreamingCrawlCorpus.corpus(), EXACTLY the rows batch
    crawl_to_corpus produces over the union — including retroactive
    exact-dedup displacement (a smaller doc_id arriving in a later file)
    and cross-batch near-dup pairs."""
    import hashlib

    from conftest import SF_DIR
    from pyspark.sql import functions as F

    from spdb_spark.session import load_tables
    from spdb_spark.sources.crawl import crawl_to_corpus
    from spdb_spark.sources.warc import (
        ingest_warc,
        warc_encode,
        warc_responses_to_docs,
    )
    from spdb_spark.streaming.crawl import (
        StreamingCrawlCorpus,
        stream_crawl_docs,
    )
    from spdb_spark.suite_crawl import _NEARDUP_THRESHOLD, warc_records_from_docs

    docs_tbl = load_tables(spark, SF_DIR)["documents"]
    recs = warc_records_from_docs(docs_tbl).collect()
    # deterministic pseudo-random 3-way split so same-content groups
    # straddle files in both arrival orders
    recs = sorted(recs, key=lambda r: hashlib.md5(r.target_uri.encode()).hexdigest())
    files: list[list[dict]] = [[], [], []]
    for i, r in enumerate(recs):
        files[i % 3].append(
            {
                "warc_type": r.warc_type,
                "target_uri": r.target_uri,
                "payload": bytes(r.payload),
            }
        )
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "f0.warc.gz").write_bytes(warc_encode(files[0]))

    sink = StreamingCrawlCorpus(
        spark, str(tmp_path / "state"), minhash_threshold=_NEARDUP_THRESHOLD
    )
    ckpt = str(tmp_path / "ckpt")
    q = sink.start(stream_crawl_docs(spark, str(feed)), ckpt)
    q.awaitTermination(300)
    n_partial = sink.corpus().count()
    assert n_partial > 0

    # two more files arrive; the restarted query picks up ONLY them,
    # one file per micro-batch (backpressure parameter exercised)
    for j in (1, 2):
        (feed / f"f{j}.warc.gz").write_bytes(warc_encode(files[j]))
    q = sink.start(
        stream_crawl_docs(spark, str(feed), max_files_per_trigger=1), ckpt
    )
    q.awaitTermination(300)
    assert len(sink._committed()) >= 3

    got = {tuple(r) for r in sink.corpus().collect()}
    want = {
        tuple(r)
        for r in crawl_to_corpus(
            ingest_warc(spark, str(feed)), minhash_threshold=_NEARDUP_THRESHOLD
        ).collect()
    }
    assert len(want) > 0
    assert got == want

    # the split genuinely exercised retroactive displacement: some
    # content group's min doc_id arrived in a LATER file than another
    # occurrence of the same content
    all_docs = warc_responses_to_docs(
        ingest_warc(spark, str(feed)),
        main_content=True,
        normalize_urls=True,
        dedup=False,
    ).select("doc_id", "source", F.md5("text").alias("h"))
    uri_file = {}
    for j, fl in enumerate(files):
        for rec in fl:
            if rec["warc_type"] == "response":
                uri_file[rec["target_uri"]] = j
    from spdb_spark.functions.url import url_normalize

    raw = spark.createDataFrame(
        [(u, j) for u, j in uri_file.items()], "raw string, file int"
    ).select(url_normalize(F.col("raw")).alias("source"), "file")
    placed = all_docs.join(raw, "source").collect()
    groups: dict[str, list[tuple[int, int]]] = {}
    for r in placed:
        groups.setdefault(r.h, []).append((r.doc_id, r.file))
    retro = [
        g
        for g in groups.values()
        if len({d for d, _ in g}) > 1
        and min(g)[1] > min(f for _, f in g)
    ]
    assert retro, "split never placed a group's min doc_id in a later file"

    # a redelivered batch id is a no-op (exactly-once)
    before = sink.corpus().count()
    sink.process_batch(
        spark.createDataFrame([], "doc_id long, text string, lang string,"
                                  " source string, n_chars int"),
        sink._committed()[-1],
    )
    assert sink.corpus().count() == before


def test_streaming_crawl_corpus_compaction_preserves_state(spark, tmp_path):
    from spdb_spark.sources.warc import warc_encode
    from spdb_spark.streaming.crawl import (
        StreamingCrawlCorpus,
        stream_crawl_docs,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.warc.gz").write_bytes(_warc_bytes("alpha", 6))
    (feed / "b.warc.gz").write_bytes(_warc_bytes("beta", 4))
    sink = StreamingCrawlCorpus(spark, str(tmp_path / "state"), quality=False)
    q = sink.start(
        stream_crawl_docs(spark, str(feed), max_files_per_trigger=1),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    before = {tuple(r) for r in sink.corpus().collect()}
    assert len(before) == 10
    sink.compact()
    sink.vacuum()
    assert {tuple(r) for r in sink.corpus().collect()} == before


def test_streaming_corpus_with_dsir_selection_matches_batch(spark, tmp_path):
    """The FULL pipeline incl. the DSIR selection stage: streaming
    corpus_selected() must equal batch crawl_to_corpus(select_target,
    select_k) — closing stream==batch over every stage the batch
    composition offers."""
    import hashlib

    from conftest import SF_DIR

    from spdb_spark.session import load_tables
    from spdb_spark.sources.crawl import crawl_to_corpus
    from spdb_spark.sources.warc import ingest_warc, warc_encode
    from spdb_spark.streaming.crawl import (
        StreamingCrawlCorpus,
        stream_crawl_docs,
    )
    from spdb_spark.suite_crawl import _NEARDUP_THRESHOLD, warc_records_from_docs

    tables = load_tables(spark, SF_DIR)
    recs = warc_records_from_docs(tables["documents"]).collect()
    recs = sorted(recs, key=lambda r: hashlib.md5(r.target_uri.encode()).hexdigest())
    feed = tmp_path / "feed"
    feed.mkdir()
    for j in range(2):
        fl = [
            {
                "warc_type": r.warc_type,
                "target_uri": r.target_uri,
                "payload": bytes(r.payload),
            }
            for i, r in enumerate(recs)
            if i % 2 == j
        ]
        (feed / f"f{j}.warc.gz").write_bytes(warc_encode(fl))

    target = tables["documents"].where("doc_id % 10 = 0")
    sink = StreamingCrawlCorpus(
        spark, str(tmp_path / "state"), minhash_threshold=_NEARDUP_THRESHOLD
    )
    q = sink.start(
        stream_crawl_docs(spark, str(feed), max_files_per_trigger=1),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    got = {
        tuple(r) for r in sink.corpus_selected(target, select_k=25).collect()
    }
    want = {
        tuple(r)
        for r in crawl_to_corpus(
            ingest_warc(spark, str(feed)),
            minhash_threshold=_NEARDUP_THRESHOLD,
            select_target=target,
            select_k=25,
        ).collect()
    }
    assert len(want) == 25
    assert got == want


def test_streaming_link_graph_matches_batch_any_order(spark, tmp_path):
    """StreamingLinkGraph == crawl_host_ranks over the union for BOTH
    arrival orders, with duplicate pages straddling files (the pid
    ledger must count each distinct page's links exactly once)."""
    from spdb_spark.sources.warc import ingest_warc, warc_encode
    from spdb_spark.streaming.crawl import (
        StreamingLinkGraph,
        stream_warc_records,
    )
    from spdb_spark.sources.crawl import crawl_host_ranks

    def page(i: int, hub: bool = False) -> dict:
        links = "".join(
            f'<a href="http://site{j}.example/x">l</a>'
            for j in range(3 if hub else 1)
        )
        return {
            "warc_type": "response",
            "target_uri": f"http://host{i % 4}.example/p{i}",
            "payload": (
                "HTTP/1.1 200 OK\r\n\r\n<html><body>" + links
                + "</body></html>"
            ).encode(),
        }

    pages = [page(i, hub=i % 3 == 0) for i in range(12)]
    # duplicates of pages 0 and 5 land in the OTHER file
    fa = pages[:6] + [pages[5]]
    fb = pages[6:] + [pages[0], pages[5]]

    def run(order):
        feed = tmp_path / f"feed{order[0]['f']}"
        feed.mkdir()
        for name, recs in [(o["f"], o["recs"]) for o in order]:
            (feed / f"{name}.warc.gz").write_bytes(warc_encode(recs))
        sink = StreamingLinkGraph(
            spark, str(tmp_path / f"state{order[0]['f']}")
        )
        q = sink.start(
            stream_warc_records(spark, str(feed), max_files_per_trigger=1),
            str(tmp_path / f"ckpt{order[0]['f']}"),
        )
        assert q.awaitTermination(300)
        return sink

    s_ab = run([{"f": "a", "recs": fa}, {"f": "b", "recs": fb}])
    s_ba = run([{"f": "ba", "recs": fb}, {"f": "bb", "recs": fa}])

    feed_all = tmp_path / "all"
    feed_all.mkdir()
    (feed_all / "u.warc.gz").write_bytes(warc_encode(fa + fb))
    want_edges = {
        (r.src_domain, r.dst_domain): r.weight
        for r in __import__("spdb_spark.functions.linkgraph", fromlist=["x"])
        .host_graph_edges(
            __import__(
                "spdb_spark.sources.crawl", fromlist=["x"]
            ).crawl_pages(ingest_warc(spark, str(feed_all)))
            .dropDuplicates(["_pid"])
        )
        .collect()
    }
    want_ranks = {
        (r.domain, r.rank_q)
        for r in crawl_host_ranks(ingest_warc(spark, str(feed_all))).collect()
    }
    for sink in (s_ab, s_ba):
        got_edges = {
            (r.src_domain, r.dst_domain): r.weight
            for r in sink.edges().collect()
        }
        assert got_edges == want_edges
        assert {
            (r.domain, r.rank_q) for r in sink.host_ranks().collect()
        } == want_ranks


def test_streaming_ranked_corpus_matches_batch_full_composition(
    spark, tmp_path
):
    """The COMPLETE r12 batch composition — robots exclusion + quality +
    exact dedup + near-dedup + rank prior + rank floor — replayed by the
    two streaming sinks: corpus_ranked() must equal crawl_to_corpus(
    robots=..., rank_prior=True, min_host_rank_q=...) over the union."""
    import hashlib

    from conftest import SF_DIR
    from pyspark.sql import functions as F

    from spdb_spark.session import load_tables
    from spdb_spark.sources.crawl import crawl_to_corpus
    from spdb_spark.sources.warc import ingest_warc, warc_encode
    from spdb_spark.streaming.crawl import (
        StreamingCrawlCorpus,
        StreamingLinkGraph,
        stream_crawl_docs,
        stream_warc_records,
    )
    from spdb_spark.suite_crawl import (
        _NEARDUP_THRESHOLD,
        warc_records_from_docs,
    )

    docs_tbl = (
        load_tables(spark, SF_DIR)["documents"].where("doc_id < 200")
    )
    recs = warc_records_from_docs(docs_tbl, links=True).collect()
    recs = sorted(
        recs, key=lambda r: hashlib.md5(r.target_uri.encode()).hexdigest()
    )
    feed = tmp_path / "feed"
    feed.mkdir()
    for j in range(3):
        fl = [
            {
                "warc_type": r.warc_type,
                "target_uri": r.target_uri,
                "payload": bytes(r.payload),
            }
            for i, r in enumerate(recs)
            if i % 3 == j
        ]
        (feed / f"f{j}.warc.gz").write_bytes(warc_encode(fl))

    # robots: three hosts blanket-block their /d paths; their LINKS
    # still feed the rank graph on both paths
    robots = spark.createDataFrame(
        [(f"site{i}.example", "User-agent: *\nDisallow: /d\n")
         for i in (0, 5, 10)],
        "host string, robots_txt string",
    )

    corpus_sink = StreamingCrawlCorpus(
        spark,
        str(tmp_path / "cstate"),
        minhash_threshold=_NEARDUP_THRESHOLD,
        robots=robots,
    )
    q = corpus_sink.start(
        stream_crawl_docs(spark, str(feed), max_files_per_trigger=1),
        str(tmp_path / "cckpt"),
    )
    assert q.awaitTermination(600)
    graph_sink = StreamingLinkGraph(spark, str(tmp_path / "gstate"))
    q = graph_sink.start(
        stream_warc_records(spark, str(feed), max_files_per_trigger=1),
        str(tmp_path / "gckpt"),
    )
    assert q.awaitTermination(600)

    got = {
        tuple(r)
        for r in corpus_sink.corpus_ranked(graph_sink)
        .select("doc_id", "source", "host_rank_q")
        .collect()
    }
    want_df = crawl_to_corpus(
        ingest_warc(spark, str(feed)),
        minhash_threshold=_NEARDUP_THRESHOLD,
        robots=robots,
        rank_prior=True,
    ).select("doc_id", "source", "host_rank_q")
    want = {tuple(r) for r in want_df.collect()}
    assert len(want) > 0
    assert got == want
    # robots actually bit: none of the blocked hosts' docs survive
    assert all(
        not s.startswith("http://site0.example") for _, s, _ in got
    )
    # rank floor: streaming filter == batch filter for a discriminating q
    qs = sorted({q for _, _, q in want if q > 0})
    floor = qs[len(qs) // 2]
    got_f = {
        tuple(r)
        for r in corpus_sink.corpus_ranked(
            graph_sink, min_host_rank_q=floor
        ).select("doc_id", "source", "host_rank_q").collect()
    }
    assert got_f == {t for t in want if t[2] >= floor}
    assert 0 < len(got_f) < len(want)
