"""WARC source: read web-archive files (ISO 28500 — the Common Crawl
format, the canonical raw input of an LLM pretraining pipeline) into
typed DataFrames, and produce them for fixtures.

Scale shape: WARC members are per-record gzip streams concatenated into
~1 GB files, which are NOT block-splittable — the unit of parallelism is
the FILE (exactly how production crawl processing shards: one task per
warc file, thousands of files in flight). `ingest_warc` therefore reads
via the binaryFile source (one row per file) and parses records inside an
Arrow-batched mapInPandas kernel; a 1000-executor cluster streams a
100 TB crawl as ~100k independent file tasks with zero shuffles before
the first curation operator.

The parser handles plain and gzip (multi-member) WARC, tolerates
malformed records by skipping to the next record boundary, and never
materializes more than one file per task. HTTP response payloads split
into headers/body with a permissive regex-based HTML->text for the
curation entry point (production swaps a real extractor like trafilatura;
the Spark-side contract is unchanged).
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("file", StringType(), False),
        StructField("record_idx", LongType(), False),
        StructField("warc_type", StringType(), True),
        StructField("record_id", StringType(), True),
        StructField("target_uri", StringType(), True),
        StructField("warc_date", StringType(), True),
        StructField("content_type", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), False),
    ]
)


def warc_encode(records: list[dict], compress: bool = True) -> bytes:
    """Build a WARC file for fixtures/tests. Each record dict:
    {"warc_type", "record_id", "target_uri", "warc_date", "content_type",
    "payload" (bytes)}. `compress=True` emits one gzip member per record
    (the Common Crawl convention); False emits plain WARC."""
    out = bytearray()
    for rec in records:
        payload = rec.get("payload", b"")
        head = [
            "WARC/1.0",
            f"WARC-Type: {rec.get('warc_type', 'response')}",
            f"WARC-Record-ID: {rec.get('record_id', '<urn:uuid:fixture>')}",
            f"WARC-Date: {rec.get('warc_date', '2026-01-01T00:00:00Z')}",
        ]
        if rec.get("target_uri"):
            head.append(f"WARC-Target-URI: {rec['target_uri']}")
        if rec.get("content_type"):
            head.append(f"Content-Type: {rec['content_type']}")
        head.append(f"Content-Length: {len(payload)}")
        member = (
            "\r\n".join(head).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"
        )
        out += gzip.compress(member) if compress else member
    return bytes(out)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes into record dicts. Handles plain and
    multi-member-gzip files; a malformed record skips forward to the next
    'WARC/' boundary instead of failing the whole file (crawl archives
    are dirty by nature)."""
    if data[:2] == b"\x1f\x8b":
        # member-by-member (zlib keeps unused_data at member boundaries):
        # a truncated/corrupt final member drops ONLY itself, every
        # complete member before it survives
        chunks = []
        rest = data
        while rest[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(31)
            try:
                chunk = d.decompress(rest)
                if not d.eof:  # truncated member
                    break
                chunks.append(chunk)
            except zlib.error:
                break
            rest = d.unused_data
        data = b"".join(chunks)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        head_start = data.find(b"WARC/", pos)
        if head_start < 0:
            break
        head_end = data.find(b"\r\n\r\n", head_start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[head_start:head_end].decode("latin-1").split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        body_start = head_end + 4
        if length < 0 or body_start + length > n:
            # malformed (non-numeric/negative) or overruns the file
            # (bogus or truncated): never move pos backwards — a negative
            # length would re-find the same header forever — and never
            # trust the record; resync at the next boundary instead
            pos = body_start
            continue
        payload = data[body_start : body_start + length]
        records.append(
            {
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "target_uri": headers.get("warc-target-uri"),
                "warc_date": headers.get("warc-date"),
                "content_type": headers.get("content-type"),
                "payload": payload,
            }
        )
        pos = body_start + length
    return records


def warc_records(raw: DataFrame) -> DataFrame:
    """(path, content) file rows -> one row per WARC record, via one
    Arrow kernel invocation per file. Stateless: works identically on
    batch and streaming frames (streaming/crawl.py feeds it a
    binaryFile readStream)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                for i, rec in enumerate(parse_warc_bytes(bytes(row.content))):
                    out.append(
                        (
                            row.path,
                            i,
                            rec["warc_type"],
                            rec["record_id"],
                            rec["target_uri"],
                            rec["warc_date"],
                            rec["content_type"],
                            rec["payload"],
                            len(rec["payload"]),
                        )
                    )
            yield pd.DataFrame(out, columns=[f.name for f in WARC_SCHEMA.fields])

    return raw.select("path", "content").mapInPandas(kernel, WARC_SCHEMA)


def ingest_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC scan: one binaryFile row per .warc[.gz] file, one
    Arrow kernel invocation per file, one output row per record. No
    shuffle — downstream operators decide the partitioning."""
    raw = spark.read.format("binaryFile").load(path)
    return warc_records(raw)


def http_response_body(payload: F.Column | str) -> F.Column:
    """Split an HTTP response payload (status line + headers + body) at
    the first blank line and return the BODY as a string — a Column
    expression (JVM-side split with limit=2, no UDF); payloads without
    headers pass through unchanged."""
    col = F.col(payload) if isinstance(payload, str) else payload
    s = col.cast("string")
    # F.get (not getItem): a payload with no blank line splits into one
    # element, and get() yields NULL in BOTH ANSI modes where getItem
    # throws INVALID_ARRAY_INDEX under ANSI — coalesce then passes the
    # whole payload through.
    return F.coalesce(F.get(F.split(s, r"\r\n\r\n", 2), 1), s)


def html_to_text(col: F.Column) -> F.Column:
    """Permissive HTML -> text: drop script/style blocks, strip tags,
    unescape the common entities, collapse whitespace. Pure Column
    expressions (regexp_replace chains stay in codegen); production swaps
    a real extractor, the contract (string -> string) is unchanged."""
    s = F.regexp_replace(col, r"(?is)<(script|style)[^>]*>.*?</\1>", " ")
    s = F.regexp_replace(s, r"(?s)<[^>]+>", " ")
    # '&amp;' must unescape LAST: doing it first double-unescapes nested
    # entities ('&amp;lt;' in source means literal '&lt;' text, not '<')
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        s = F.replace(s, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def warc_responses_to_docs(
    warc: DataFrame,
    main_content: bool = False,
    normalize_urls: bool = False,
    dedup: bool = True,
) -> DataFrame:
    """The curation entry point: WARC response records -> the documents
    schema (doc_id, text, lang, source, n_chars) every curation operator
    consumes. Ids are content-addressed (pure function of uri+content,
    partitioning-invariant); EXACT re-fetches — the same payload captured
    again at the same URI, what WARC revisit records model — collapse to
    one document here, while same-content-different-URI and near-dup
    copies survive for the dedup operators to judge by policy (matching
    sources/corpus.py).

    main_content=True swaps the flat tag-strip for the boilerplate-aware
    block classifier (functions/html.py): nav/footer/chrome blocks are
    dropped before the text reaches dedup and quality scoring — still a
    pure projection, so the plan shape is unchanged.

    normalize_urls=True canonicalizes target_uri (functions/url.py:
    fragment/tracking-param/default-port/case) BEFORE it enters the
    content-addressed id, so the same payload refetched under spelling
    variants of one URL collapses like an exact revisit."""
    from spdb_spark.functions.hashing import md5_long
    from spdb_spark.functions.text import lang_id

    uri = F.col("target_uri")
    if normalize_urls:
        from spdb_spark.functions.url import url_normalize

        uri = url_normalize(uri)
    body = http_response_body(F.col("payload"))
    if main_content:
        from spdb_spark.functions.html import html_main_text

        text = html_main_text(body)
    else:
        text = html_to_text(body)
    out = warc.where(F.col("warc_type") == "response").select(
        md5_long(
            F.concat_ws("\x1f", uri, F.md5(F.col("payload")))
        ).alias("doc_id"),
        text.alias("text"),
        uri.alias("source"),
    )
    if dedup:
        # exact-revisit collapse; STATEFUL on a stream (unbounded
        # dropDuplicates) — streaming callers pass dedup=False and
        # route exact dedup through the incremental ledger sinks
        # (streaming/dedup.py) instead
        out = out.dropDuplicates(["doc_id"])
    # where_above: with dedup=True the aggregate is already a pushdown
    # barrier; with dedup=False the filter would tunnel below the
    # projection and re-run the whole extraction inside itself.
    # Accepted trade: cheap caller predicates (a source/URL prune) stop
    # here too instead of reaching the WARC scan — callers that prune
    # hard should filter the WARC frame before calling (see
    # crawl.docs_from_pages for the full rationale).
    from spdb_spark.session import where_above

    return where_above(out, F.length("text") > 0).select(
        "doc_id",
        "text",
        lang_id(F.col("text")).alias("lang"),
        "source",
        F.length("text").cast("int").alias("n_chars"),
    )


WARC_MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("source", StringType(), True),
        StructField("container", StringType(), False),
        StructField("codec", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_frames", LongType(), True),
        StructField("payload", BinaryType(), False),
    ]
)


def warc_media(warc: DataFrame) -> DataFrame:
    """WARC response records -> media rows: the crawl-side twin of
    warc_responses_to_docs for IMAGES/AUDIO/VIDEO. One Arrow kernel
    splits the HTTP payload at the header boundary IN BYTES (the string
    cast html extraction uses would corrupt binary bodies), SNIFFS the
    body with the header-only probe (crawl Content-Type headers lie;
    magic bytes don't), and emits probe metadata next to the body so
    consumers prune by resolution/duration before any decode
    (functions/multimodal.extract_frame_features on the survivors).
    Rows whose bodies match no known container are dropped here — text
    responses belong to warc_responses_to_docs. Ids are content-addressed
    like the documents path, so exact re-fetches collapse."""
    import hashlib

    from spdb_spark.functions.probe import probe_payload

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_MEDIA_SCHEMA.fields]
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                if row.warc_type != "response" or row.payload is None:
                    continue
                payload = bytes(row.payload)
                split = payload.find(b"\r\n\r\n")
                body = payload[split + 4 :] if split >= 0 else payload
                if not body:
                    continue
                try:
                    container, f = probe_payload(body)
                except Exception:
                    continue  # not media (html/text/unknown)
                digest = hashlib.md5(
                    (row.target_uri or "").encode() + b"\x1f" + body
                ).digest()
                media_id = int.from_bytes(digest[:8], "big") >> 1
                out.append(
                    (media_id, row.target_uri, container, f["codec"],
                     f["width"], f["height"], f["duration_ms"],
                     f["n_frames"], body)
                )
            yield pd.DataFrame(out, columns=cols)

    return (
        warc.select("warc_type", "target_uri", "payload")
        .mapInPandas(kernel, WARC_MEDIA_SCHEMA)
        .dropDuplicates(["media_id"])
    )
