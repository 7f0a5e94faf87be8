"""Incremental crawl ingest: a Structured Streaming WARC-watcher.

New .warc[.gz] files landing in a directory flow through the SAME
kernels and Column expressions as batch crawl ingest — per-file record
parse (sources/warc.warc_records), main-content extraction, URL
normalization (sources/warc.warc_responses_to_docs) — into documents
rows ready for the stateless curation columns
(streaming/curation.curate_crawl_stream) and the incremental dedup
sinks. Exactly-once per WARC file comes from the file-source checkpoint
(the ingest unit of a crawl feed IS the file — Common Crawl ships ~1 GB
non-splittable .warc.gz segments).

Statefulness policy: everything here is a stateless projection
(stream == batch row-for-row, pinned in tests). The batch path's exact
revisit collapse (dropDuplicates on the content-addressed doc_id) is a
STATEFUL operator on an unbounded stream, so the streaming docs pass
`dedup=False` and exact dedup runs through the ledger-backed
incremental sinks (streaming/dedup.py), the same split every other
streaming analogue in this repo makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_warc_records(spark: SparkSession, warc_dir: str) -> DataFrame:
    """readStream over a crawl-feed directory: one row per WARC record
    of each newly-arrived file."""
    from spdb_spark.sources.warc import warc_records

    raw = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .load(warc_dir)
    )
    return warc_records(raw)


def stream_crawl_docs(
    spark: SparkSession,
    warc_dir: str,
    main_content: bool = True,
    normalize_urls: bool = True,
) -> DataFrame:
    """WARC feed -> documents-schema rows (doc_id, text, lang, source,
    n_chars), stateless end-to-end; compose curation columns with
    curate_crawl_stream and dedup with the incremental sinks."""
    from spdb_spark.sources.warc import warc_responses_to_docs

    recs = stream_warc_records(spark, warc_dir)
    return warc_responses_to_docs(
        recs,
        main_content=main_content,
        normalize_urls=normalize_urls,
        dedup=False,
    )
