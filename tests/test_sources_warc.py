"""WARC source (sources/warc.py): fixture round-trips for plain and
per-record-gzip files, malformed-record resync, HTTP body split, HTML
stripping, and the documents-schema entry point with content-addressed
partitioning-invariant ids."""

import gzip

from pyspark.sql import functions as F

from spdb_spark.sources.warc import (
    html_to_text,
    http_response_body,
    ingest_warc,
    parse_warc_bytes,
    warc_encode,
    warc_responses_to_docs,
)


def _http(body: str, ctype: str = "text/html") -> bytes:
    return (
        f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n{body}"
    ).encode()


def _records():
    return [
        {
            "warc_type": "warcinfo",
            "record_id": "<urn:uuid:info>",
            "content_type": "application/warc-fields",
            "payload": b"software: spdb-spark-fixture\r\n",
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:r1>",
            "target_uri": "http://example.org/a",
            "content_type": "application/http; msgtype=response",
            "payload": _http("<html><body><h1>Alpha</h1><p>hello world</p></body></html>"),
        },
        {
            "warc_type": "request",
            "record_id": "<urn:uuid:q1>",
            "target_uri": "http://example.org/a",
            "content_type": "application/http; msgtype=request",
            "payload": b"GET /a HTTP/1.1\r\nHost: example.org\r\n\r\n",
        },
        {
            "warc_type": "response",
            "record_id": "<urn:uuid:r2>",
            "target_uri": "http://example.org/b",
            "content_type": "application/http; msgtype=response",
            "payload": _http(
                "<html><script>var x=1;</script><p>bravo &amp; charlie</p></html>"
            ),
        },
    ]


class TestParser:
    def test_roundtrip_plain_and_gzip(self):
        recs = _records()
        for compress in (False, True):
            got = parse_warc_bytes(warc_encode(recs, compress=compress))
            assert len(got) == len(recs)
            for want, have in zip(recs, got):
                assert have["warc_type"] == want["warc_type"]
                assert have["record_id"] == want["record_id"]
                assert have["payload"] == want["payload"]
                assert have["target_uri"] == want.get("target_uri")

    def test_gzip_members_are_independent(self):
        # Common Crawl convention: each record its own gzip member, so a
        # reader can resynchronize per member
        blob = warc_encode(_records(), compress=True)
        # decompressing only the FIRST member yields only the first record
        import zlib

        d = zlib.decompressobj(31)
        first = d.decompress(blob)
        assert d.unused_data  # more members follow
        assert len(parse_warc_bytes(first)) == 1

    def test_malformed_record_resyncs(self):
        recs = _records()
        good = warc_encode(recs[:1], compress=False)
        bad = b"WARC/1.0\r\nContent-Length: notanumber\r\n\r\ngarbage"
        tail = warc_encode(recs[1:2], compress=False)
        got = parse_warc_bytes(good + bad + tail)
        ids = [r["record_id"] for r in got]
        assert "<urn:uuid:info>" in ids and "<urn:uuid:r1>" in ids

    def test_truncated_gzip_tail_keeps_whole_members(self):
        blob = warc_encode(_records(), compress=True)
        got = parse_warc_bytes(blob[: len(blob) - 7])  # cut mid-member
        assert 1 <= len(got) < len(_records())


class TestIngest:
    def test_ingest_schema_and_rows(self, spark, tmp_path):
        p = tmp_path / "crawl"
        p.mkdir()
        (p / "f1.warc.gz").write_bytes(warc_encode(_records(), compress=True))
        (p / "f2.warc").write_bytes(warc_encode(_records()[:2], compress=False))
        df = ingest_warc(spark, str(p))
        rows = df.collect()
        assert len(rows) == 6
        by_file = {}
        for r in rows:
            by_file.setdefault(r.file.rsplit("/", 1)[-1], []).append(r)
        assert len(by_file["f1.warc.gz"]) == 4
        assert [r.record_idx for r in sorted(by_file["f2.warc"], key=lambda r: r.record_idx)] == [0, 1]
        resp = [r for r in rows if r.warc_type == "response"]
        assert all(r.target_uri.startswith("http://example.org/") for r in resp)
        assert all(r.n_bytes == len(bytes(r.payload)) for r in rows)

    def test_http_body_and_html_text(self, spark):
        df = spark.createDataFrame(
            [
                (1, bytearray(_http("<p>hello &amp; bye</p>"))),
                (2, bytearray(b"no headers at all")),
            ],
            "id long, payload binary",
        )
        got = {
            r.id: (r.body, r.text)
            for r in df.select(
                "id",
                http_response_body(F.col("payload")).alias("body"),
                html_to_text(http_response_body(F.col("payload"))).alias("text"),
            ).collect()
        }
        assert got[1] == ("<p>hello &amp; bye</p>", "hello & bye")
        assert got[2][0] == "no headers at all"

    def test_responses_to_docs_contract(self, spark, tmp_path):
        p = tmp_path / "crawl2"
        p.mkdir()
        (p / "f.warc.gz").write_bytes(warc_encode(_records(), compress=True))
        docs = warc_responses_to_docs(ingest_warc(spark, str(p)))
        rows = docs.collect()
        assert {r.source for r in rows} == {
            "http://example.org/a",
            "http://example.org/b",
        }
        texts = {r.source: r.text for r in rows}
        assert texts["http://example.org/a"] == "Alpha hello world"
        assert texts["http://example.org/b"] == "bravo & charlie"  # script gone
        assert all(r.n_chars == len(r.text) for r in rows)
        assert set(docs.columns) == {"doc_id", "text", "lang", "source", "n_chars"}

        # ids are a pure function of (uri, payload): re-ingest and
        # repartition cannot move them
        again = {
            r.source: r.doc_id
            for r in warc_responses_to_docs(
                ingest_warc(spark, str(p)).repartition(7)
            ).collect()
        }
        assert again == {r.source: r.doc_id for r in rows}

    def test_no_shuffle_before_curation(self, spark, tmp_path):
        p = tmp_path / "crawl3"
        p.mkdir()
        (p / "f.warc.gz").write_bytes(warc_encode(_records(), compress=True))
        plan = (
            ingest_warc(spark, str(p))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # one task per file, no shuffle

    def test_warc_feeds_curation_operators_end_to_end(self, spark, tmp_path):
        """The point of the source: crawl -> documents -> the existing
        curation stack with no adaptation. Exact dup of the same page
        fetched twice collapses; quality filtering and minhash run over
        the extracted text unchanged."""
        from spdb_spark.functions.dedup import exact_dup_groups, minhash_lsh_dedup

        page = _http(
            "<html><body>"
            + " ".join(f"word{i} common filler text body" for i in range(12))
            + "</body></html>"
        )
        recs = [
            {
                "warc_type": "response",
                "record_id": f"<urn:uuid:r{i}>",
                "target_uri": f"http://example.org/dup{i % 2}",  # 2 distinct URIs
                "content_type": "application/http; msgtype=response",
                "payload": page,  # IDENTICAL content fetched at both
            }
            for i in range(4)
        ] + [
            {
                "warc_type": "response",
                "record_id": "<urn:uuid:u>",
                "target_uri": "http://example.org/unique",
                "content_type": "application/http; msgtype=response",
                "payload": _http("<p>totally different short page</p>"),
            }
        ]
        p = tmp_path / "crawlc"
        p.mkdir()
        (p / "f.warc.gz").write_bytes(warc_encode(recs, compress=True))
        docs = warc_responses_to_docs(ingest_warc(spark, str(p)))
        # same (uri, payload) -> same id: the 4 fetches collapse to 2 docs
        assert docs.count() == 3
        groups = exact_dup_groups(docs, "doc_id", "text").collect()
        by_n = sorted(g.n_docs for g in groups)
        assert by_n == [1, 2]  # the two dup-URI docs share one content hash
        pairs = minhash_lsh_dedup(
            docs, "doc_id", "text", threshold=0.5, n_docs=3
        ).collect()
        assert len(pairs) == 1 and pairs[0].jaccard == 1.0


def test_negative_and_oversized_content_length_resync():
    """Review r6: a negative Content-Length must never move the cursor
    backwards (infinite loop), and an overrunning one must resync to the
    next record instead of silently swallowing the rest of the file."""
    recs = _records()
    good_head = warc_encode(recs[:1], compress=False)
    neg = b"WARC/1.0\r\nWARC-Record-ID: <urn:uuid:neg>\r\nContent-Length: -200\r\n\r\nx"
    big = b"WARC/1.0\r\nWARC-Record-ID: <urn:uuid:big>\r\nContent-Length: 999999\r\n\r\nshort"
    good_tail = warc_encode(recs[1:2], compress=False)
    got = parse_warc_bytes(good_head + neg + good_tail + big + good_tail)
    ids = [r["record_id"] for r in got]
    assert "<urn:uuid:info>" in ids
    assert ids.count("<urn:uuid:r1>") == 2  # both real records after junk
    assert "<urn:uuid:neg>" not in ids and "<urn:uuid:big>" not in ids


def test_nested_entities_not_double_unescaped(spark):
    df = spark.createDataFrame(
        [(1, "<p>a &amp;lt; b and x &amp; y</p>")], "id long, s string"
    )
    (r,) = df.select(html_to_text(F.col("s")).alias("t")).collect()
    assert r.t == "a &lt; b and x & y"


def test_warc_media_extracts_and_sniffs(spark, tmp_path):
    """The crawl media path: image/audio response bodies are split from
    their HTTP headers IN BYTES, sniffed by magic (the declared
    Content-Type lies on purpose here), probed, and flow into the real
    decode kernel; html/text/garbage responses are left to the docs
    path."""
    import numpy as np

    from spdb_spark.functions.audio import wav_encode
    from spdb_spark.functions.jpeg import jpeg_encode
    from spdb_spark.functions.multimodal import extract_frame_features
    from spdb_spark.operators.render import png_encode
    from spdb_spark.sources.warc import ingest_warc, warc_encode, warc_media

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 30), dtype=np.uint8)
    pcm = rng.integers(-500, 500, 1200, dtype=np.int16)

    def http(body, ctype):
        return (f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n").encode() + body

    records = [
        {"warc_type": "response", "record_id": "a", "target_uri": "http://x/1",
         "warc_date": "2026-01-01", "content_type": "application/http",
         "payload": http(png_encode(img), "text/plain")},  # lying mime
        {"warc_type": "response", "record_id": "b", "target_uri": "http://x/2",
         "warc_date": "2026-01-01", "content_type": "application/http",
         "payload": http(jpeg_encode(img, quality=90), "image/jpeg")},
        {"warc_type": "response", "record_id": "c", "target_uri": "http://x/3",
         "warc_date": "2026-01-01", "content_type": "application/http",
         "payload": http(wav_encode(pcm), "audio/wav")},
        {"warc_type": "response", "record_id": "d", "target_uri": "http://x/4",
         "warc_date": "2026-01-01", "content_type": "application/http",
         "payload": http(b"<html><body>hi</body></html>", "text/html")},
        {"warc_type": "request", "record_id": "e", "target_uri": "http://x/1",
         "warc_date": "2026-01-01", "content_type": "application/http",
         "payload": b"GET / HTTP/1.1\r\n\r\n"},
        # exact re-fetch of the PNG: collapses by content-addressed id
        {"warc_type": "response", "record_id": "f", "target_uri": "http://x/1",
         "warc_date": "2026-01-02", "content_type": "application/http",
         "payload": http(png_encode(img), "image/png")},
    ]
    p = tmp_path / "warcs"
    p.mkdir()
    (p / "crawl.warc.gz").write_bytes(warc_encode(records))

    media = warc_media(ingest_warc(spark, str(p)))
    rows = {r.source: r for r in media.collect()}
    assert set(rows) == {"http://x/1", "http://x/2", "http://x/3"}
    assert rows["http://x/1"].container == "png"  # sniffed, not the lying mime
    assert (rows["http://x/1"].width, rows["http://x/1"].height) == (30, 20)
    assert rows["http://x/2"].codec == "jpeg/baseline"
    assert rows["http://x/3"].container == "wav"
    assert rows["http://x/3"].duration_ms == 1200 * 1000 // 16000

    feats = extract_frame_features(
        media.select("media_id", "payload"), n_frames=2, dim=4
    ).collect()
    assert len(feats) == 3 * 2 and all(r.status == "ok" for r in feats)
