"""ZIP-shard source: read .zip archives of `<key>.<ext>` member files —
the other common shard layout for distributed training corpora (many
public datasets ship as zip rather than tar).

Scale shape (same as sources/warc.py / webdataset.py): the unit of
parallelism is the SHARD file — one binaryFile row per zip, one Arrow
kernel walk per shard, zero shuffles until sample assembly. Member rows
use the exact WebDataset schema (shard, key, ext, payload, n_bytes), so
`webdataset_samples` / `webdataset_to_docs` consume zip shards
unchanged — one ingest surface, two container formats.

Robustness: zip carries its central directory at the END of the file, so
a truncated shard loses the directory entirely (unlike tar, which dies
only at the tail). `parse_zip_bytes` falls back to scanning local file
headers (PK\\x03\\x04) and recovers every complete member whose sizes are
in the header, CRC-verified; members written with streaming data
descriptors (flag bit 3: sizes deferred) are unrecoverable without the
directory and are skipped. Encrypted members (flag bit 0) and members
declaring more than `max_member_bytes` decompressed (zip-bomb guard:
deflate amplifies ~1000x, so a small hostile shard can claim GBs) are
skipped, never errored — shard corpora are dirty by nature.
"""

from __future__ import annotations

import io
import struct
import zipfile
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from spdb_spark.sources.webdataset import WDS_SCHEMA

# Per-member decompressed cap: far above real corpus members, far below
# what a crafted ratio-bomb shard can claim.
MAX_MEMBER_BYTES = 1 << 30


def zip_encode(
    samples: dict[str, dict[str, bytes]], compress: bool = True
) -> bytes:
    """Build a zip shard for fixtures/tests: {key: {ext: payload}}."""
    buf = io.BytesIO()
    method = zipfile.ZIP_DEFLATED if compress else zipfile.ZIP_STORED
    with zipfile.ZipFile(buf, "w", method) as zf:
        for key in sorted(samples):
            for ext in sorted(samples[key]):
                # fixed timestamp: writestr would stamp NOW, breaking the
                # export path's byte-deterministic re-run contract
                info = zipfile.ZipInfo(f"{key}.{ext}", (1980, 1, 1, 0, 0, 0))
                info.compress_type = method
                zf.writestr(info, samples[key][ext])
    return buf.getvalue()


def _split_key(name: str) -> tuple[str, str] | None:
    """Member name -> (key, ext) by the WebDataset convention (key = name
    up to the FIRST dot of the basename); None for directories and
    extension-less members."""
    if name.endswith("/"):
        return None
    base = name.rsplit("/", 1)[-1]
    if "." not in base:
        return None
    stem, ext = base.split(".", 1)
    return name[: len(name) - len(base)] + stem, ext


def _scan_local_headers(
    data: bytes, max_member_bytes: int
) -> list[tuple[str, str, bytes]]:
    """Directory-less recovery: walk PK\\x03\\x04 local headers from the
    front, CRC-checking each member. Stops at the first member it cannot
    bound (streaming data descriptor) or decode — everything before a
    truncation point survives."""
    out: dict[tuple[str, str], bytes] = {}
    pos = 0
    n = len(data)
    while pos + 30 <= n and data[pos : pos + 4] == b"PK\x03\x04":
        flags, method = struct.unpack_from("<HH", data, pos + 6)
        crc, csize, usize = struct.unpack_from("<III", data, pos + 14)
        name_len, extra_len = struct.unpack_from("<HH", data, pos + 26)
        body = pos + 30 + name_len + extra_len
        if flags & 0x8:  # sizes in a trailing descriptor: unbounded here
            break
        if body + csize > n:  # truncated member
            break
        name = data[pos + 30 : pos + 30 + name_len].decode("utf-8", "replace")
        pos = body + csize
        if flags & 0x1:  # encrypted
            continue
        ke = _split_key(name)
        if ke is None or usize > max_member_bytes:
            continue
        raw = data[body : body + csize]
        try:
            if method == zipfile.ZIP_STORED:
                payload = raw
            elif method == zipfile.ZIP_DEFLATED:
                payload = zlib.decompressobj(-15).decompress(
                    raw, max_member_bytes + 1
                )
            else:
                continue
        except zlib.error:
            continue
        if len(payload) != usize or zlib.crc32(payload) != crc:
            continue
        out[ke] = payload
    return [(k, e, p) for (k, e), p in out.items()]


def parse_zip_bytes(
    data: bytes, max_member_bytes: int = MAX_MEMBER_BYTES
) -> list[tuple[str, str, bytes]]:
    """One shard's bytes -> [(key, ext, payload)], last duplicate wins
    (extraction semantics, matching the tar walk)."""
    out: dict[tuple[str, str], bytes] = {}
    read_failures = False
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            for info in zf.infolist():
                ke = _split_key(info.filename)
                if ke is None:
                    continue
                if info.flag_bits & 0x1:  # encrypted
                    continue
                if info.file_size > max_member_bytes:  # bomb guard
                    continue
                try:
                    out[ke] = zf.read(info)
                except (
                    zipfile.BadZipFile,
                    zlib.error,
                    NotImplementedError,
                    # a corrupted compress_size can exhaust the raw
                    # stream mid-member: EOFError (fuzz-found)
                    EOFError,
                    # corrupt directory offsets surface as plain
                    # ValueError ("negative seek value") / OSError from
                    # the underlying seek, not BadZipFile (fuzz-found)
                    ValueError,
                    OSError,
                    struct.error,
                ):
                    read_failures = True
                    continue
    except (
        zipfile.BadZipFile,
        ValueError,
        OSError,
        struct.error,
        EOFError,
        # a flipped extract_version byte in a central-directory entry
        # makes open() itself raise NotImplementedError ("zip file
        # version 8.4") before any member read (fuzz-found)
        NotImplementedError,
    ):
        # central directory missing/corrupt (truncated upload, flipped
        # offset bytes): recover what the local headers can prove complete
        return _scan_local_headers(data, max_member_bytes)
    if read_failures:
        # a flipped EOCD field can leave a PARTIAL directory that still
        # opens (fuzz-found: 1 of 4 entries visible, that one unreadable)
        # — merge in whatever the local headers prove complete, with
        # directory-read members taking precedence
        merged = {
            (k, e): p
            for k, e, p in _scan_local_headers(data, max_member_bytes)
        }
        merged.update(out)
        out = merged
    return [(k, e, p) for (k, e), p in out.items()]


def zip_members(raw: DataFrame) -> DataFrame:
    """(path, content) shard rows -> one row per member, WDS_SCHEMA.
    Stateless mapInPandas: works on batch and streaming inputs, so the
    shard-watcher pipeline (streaming/media.py pattern) can consume zip
    shards too."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                for key, ext, payload in parse_zip_bytes(bytes(row.content)):
                    out.append((row.path, key, ext, payload, len(payload)))
            yield pd.DataFrame(out, columns=[f.name for f in WDS_SCHEMA.fields])

    return raw.select("path", "content").mapInPandas(kernel, WDS_SCHEMA)


def ingest_zipshard(spark: SparkSession, path: str) -> DataFrame:
    """Distributed shard scan: one binaryFile row per .zip shard, one
    Arrow kernel walk per shard, one member row out. No shuffle;
    `webdataset_samples` adds the single sample-assembly exchange."""
    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    return zip_members(raw)
