"""WebDataset source: read .tar shard files — the de-facto standard layout
for large multimodal training corpora (a tar archive of files named
`<key>.<ext>`, where all files sharing a key form one SAMPLE, e.g.
`000123.jpg` + `000123.txt` + `000123.json`).

Scale shape (same as sources/warc.py): tar shards are sequential archives
read whole — the unit of parallelism is the SHARD file, exactly how
WebDataset pipelines shard work in production (thousands of ~1 GB shards,
one reader task each). `ingest_webdataset` reads via binaryFile and walks
each tar inside an Arrow kernel; `webdataset_samples` groups member rows
into one row per sample with a payload map. Zero shuffles until the
sample grouping, and that single shuffle is keyed by (shard, key) — one
exchange for the whole assembly.

Pure-stdlib tar walk (tarfile over an in-memory buffer); gzip-compressed
shards (.tar.gz) decompress transparently. Malformed members are skipped,
not errored — shard corpora are dirty at the tail by nature.
"""

from __future__ import annotations

import gzip
import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WDS_SCHEMA = StructType(
    [
        StructField("shard", StringType(), False),
        StructField("key", StringType(), False),
        StructField("ext", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)


def wds_encode(samples: dict[str, dict[str, bytes]], compress: bool = False) -> bytes:
    """Build a WebDataset shard for fixtures/tests: {key: {ext: payload}}.
    Members are emitted key-grouped (the format's contract: a sample's
    files are adjacent in the archive)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for key in sorted(samples):
            for ext in sorted(samples[key]):
                data = samples[key][ext]
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
    raw = buf.getvalue()
    # mtime=0 keeps compressed shards byte-deterministic across runs
    # (the export path diffs re-runs by md5)
    return gzip.compress(raw, mtime=0) if compress else raw


# Whole-shard decompressed cap: real shards run ~1-4 GiB uncompressed;
# a crafted single-layer xz reaches ~10^8:1, so a KB-sized hostile shard
# could claim hundreds of GB without this.
MAX_SHARD_BYTES = 8 << 30


def _decompress_shard(data: bytes) -> bytes | None:
    """Transparent gzip (multi-member) / xz / bz2 shard decompression
    with a total-output cap. None = ratio bomb (skip the whole shard);
    truncated/corrupt members keep the complete prefix (the tar walk
    already survives a cut tail)."""
    if data[:2] == b"\x1f\x8b":
        import zlib

        chunks: list[bytes] = []
        rest, total = data, 0
        while rest[:2] == b"\x1f\x8b":
            d = zlib.decompressobj(31)
            try:
                chunk = d.decompress(rest, MAX_SHARD_BYTES + 1 - total)
            except zlib.error:
                break
            chunks.append(chunk)
            total += len(chunk)
            if total > MAX_SHARD_BYTES:
                return None
            if not d.eof:  # truncated member
                break
            rest = d.unused_data
        return b"".join(chunks)
    if data[:6] == b"\xfd7zXZ\x00":
        import lzma

        try:
            out = lzma.LZMADecompressor().decompress(data, MAX_SHARD_BYTES + 1)
        except lzma.LZMAError:
            return b""
        return None if len(out) > MAX_SHARD_BYTES else out
    if data[:3] == b"BZh":
        import bz2

        try:
            out = bz2.BZ2Decompressor().decompress(data, MAX_SHARD_BYTES + 1)
        except (OSError, ValueError, EOFError):
            return b""
        return None if len(out) > MAX_SHARD_BYTES else out
    return data


def parse_wds_bytes(data: bytes) -> list[tuple[str, str, bytes]]:
    """One shard's bytes -> [(key, ext, payload)]. `key` is the member
    name up to the FIRST dot of its basename (WebDataset convention, so
    `a/b/000123.seg.png` has key `a/b/000123` and ext `seg.png`);
    directories and unreadable members are skipped. Shards may be plain
    tar or gzip/xz/bz2-compressed (capped: see _decompress_shard)."""
    maybe = _decompress_shard(data)
    if maybe is None or maybe == b"":
        return []
    data = maybe
    # dict keyed by (key, ext): tar legally allows duplicate member names
    # (tar --append, restarted writes) and extraction semantics is LAST
    # member wins — deduping here also keeps webdataset_samples'
    # map_from_entries from aborting on a duplicated map key
    out: dict[tuple[str, str], bytes] = {}
    try:
        with tarfile.open(fileobj=io.BytesIO(data), mode="r") as tf:
            for info in tf:
                if not info.isfile():
                    continue
                base = info.name.rsplit("/", 1)[-1]
                if "." not in base:
                    continue
                dirpart = info.name[: len(info.name) - len(base)]
                stem, ext = base.split(".", 1)
                fh = tf.extractfile(info)
                if fh is None:
                    continue
                out[(dirpart + stem, ext)] = fh.read()
    except tarfile.TarError:
        pass  # truncated shard tail: keep the members already walked
    return [(key, ext, payload) for (key, ext), payload in out.items()]


def webdataset_members(raw: DataFrame) -> DataFrame:
    """(path, content) shard rows -> one row per member file, via one
    Arrow kernel walk per shard. Works on batch AND streaming inputs
    (stateless mapInPandas), so the incremental shard-watcher pipeline
    (streaming/media.py) shares this exact kernel with ingest."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                for key, ext, payload in parse_wds_bytes(bytes(row.content)):
                    out.append((row.path, key, ext, payload, len(payload)))
            yield pd.DataFrame(out, columns=[f.name for f in WDS_SCHEMA.fields])

    return raw.select("path", "content").mapInPandas(kernel, WDS_SCHEMA)


def ingest_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Distributed shard scan: one binaryFile row per .tar[.gz] shard,
    one Arrow kernel walk per shard, one output row per member file.
    No shuffle — `webdataset_samples` adds the single sample-assembly
    exchange when the consumer wants sample rows."""
    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    return webdataset_members(raw)


def webdataset_samples(members: DataFrame) -> DataFrame:
    """Assemble member rows into SAMPLE rows: (shard, key, exts,
    payloads, n_files, n_bytes) with payloads an ext->binary map. ONE
    (shard, key)-keyed aggregation — the only exchange in the whole
    ingest; map_from_entries keeps the assembly JVM-side."""
    return (
        members.groupBy("shard", "key")
        .agg(
            F.sort_array(F.collect_list("ext")).alias("exts"),
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(F.struct(F.col("ext"), F.col("payload")))
                )
            ).alias("payloads"),
            F.count("*").alias("n_files"),
            F.sum("n_bytes").alias("n_bytes"),
        )
    )


def webdataset_to_docs(members: DataFrame, text_exts: tuple = ("txt",)) -> DataFrame:
    """Text-modality entry point: members with a text extension ->
    the documents schema every curation operator consumes (ids
    content-addressed on shard-relative key + content, partitioning-
    invariant; same policy as sources/corpus.py)."""
    from spdb_spark.functions.hashing import md5_long
    from spdb_spark.functions.text import lang_id

    text = F.col("payload").cast("string")
    return (
        members.where(F.col("ext").isin(list(text_exts)))
        .select(
            md5_long(
                F.concat_ws("\x1f", F.col("key"), F.md5(F.col("payload")))
            ).alias("doc_id"),
            text.alias("text"),
            F.col("key").alias("source"),
        )
        .dropDuplicates(["doc_id"])
        .where(F.length("text") > 0)
        .select(
            "doc_id",
            "text",
            lang_id(F.col("text")).alias("lang"),
            "source",
            F.length("text").cast("int").alias("n_chars"),
        )
    )
