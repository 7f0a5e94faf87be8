"""TFRecord shard sink/source with a dependency-free tf.train.Example
codec — the standard TensorFlow training-corpus container, completing
the export matrix next to jsonl.gz (shards.py), WebDataset tar
(webdataset.py) and zip (zipshard.py).

Format (public TFRecord spec, tensorflow/core/lib/io/record_writer.h):

    uint64 length (little-endian)
    uint32 masked_crc32c(length bytes)
    byte   data[length]
    uint32 masked_crc32c(data)

where masked_crc(x) = rotr15(crc32c(x)) + 0xa282ead8 (mod 2^32) and
crc32c is the Castagnoli CRC (poly 0x82F63B78, reflected) — implemented
here table-driven (slicing-by-8) in pure Python; a deployment that
needs native speed swaps `crc32c` for google-crc32c at this one symbol.

The payloads are tf.train.Example protobufs, encoded/decoded with the
public protobuf wire format directly (varints + length-delimited
fields) — no protobuf dependency. Supported exactly the feature surface
tf.train defines: BytesList / FloatList / Int64List. The encoder emits
packed primitive lists (as the tensorflow .proto declares); the decoder
accepts both packed and unpacked wire forms, as protobuf parsers must.

Scale shape (same as the sibling shard sources): the unit of
parallelism is the SHARD — one Arrow kernel builds or walks one shard,
zero shuffles until sample assembly; `write_tfrecord_shards` mirrors
`shards.write_jsonl_shards` (deterministic shard assignment, docs
sorted by id within a shard, atomic write + content-addressed
manifest, byte-identical re-runs).

Robustness (dirty-corpus contract, as zipshard.py): a record whose
LENGTH crc fails stops the walk of that shard (framing is
untrustworthy past it); a record whose DATA crc fails is skipped but
the walk continues (framing is still intact); a truncated tail is
dropped. Per-record length is capped (`max_record_bytes`) before
allocation — a hostile 8-byte header can otherwise claim GiBs.

Reference-capability analogue: none — spdb has no training-export
tier; this is north-star surface (TESTDATA documents table).
"""

from __future__ import annotations

import hashlib
import os
import struct
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Far above any real training example, far below a hostile claim.
MAX_RECORD_BYTES = 1 << 30

_CRC_POLY = 0x82F63B78  # CRC-32C (Castagnoli), reflected
_MASK_DELTA = 0xA282EAD8


def _build_tables() -> list[list[int]]:
    t0 = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = (crc >> 1) ^ (_CRC_POLY if crc & 1 else 0)
        t0.append(crc)
    tables = [t0]
    for i in range(1, 8):
        prev = tables[i - 1]
        tables.append([(prev[b] >> 8) ^ t0[prev[b] & 0xFF] for b in range(256)])
    return tables


_T = _build_tables()


def crc32c(data: bytes, crc: int = 0) -> int:
    """CRC-32C (Castagnoli) — slicing-by-8, pure Python. Swap seam for
    google-crc32c / native acceleration in a deployment."""
    crc = (crc ^ 0xFFFFFFFF) & 0xFFFFFFFF
    view = memoryview(data)
    n = len(view)
    t0, t1, t2, t3, t4, t5, t6, t7 = _T
    i = 0
    while n - i >= 8:
        crc ^= view[i] | (view[i + 1] << 8) | (view[i + 2] << 16) | (
            view[i + 3] << 24
        )
        crc = (
            t7[crc & 0xFF]
            ^ t6[(crc >> 8) & 0xFF]
            ^ t5[(crc >> 16) & 0xFF]
            ^ t4[(crc >> 24) & 0xFF]
            ^ t3[view[i + 4]]
            ^ t2[view[i + 5]]
            ^ t1[view[i + 6]]
            ^ t0[view[i + 7]]
        )
        i += 8
    while i < n:
        crc = (crc >> 8) ^ t0[(crc ^ view[i]) & 0xFF]
        i += 1
    return crc ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Record framing
# ---------------------------------------------------------------------------


def tfrecord_encode(payloads: Iterable[bytes]) -> bytes:
    """Serialize payloads into one TFRecord stream."""
    out = []
    for data in payloads:
        header = struct.pack("<Q", len(data))
        out.append(header)
        out.append(struct.pack("<I", masked_crc32c(header)))
        out.append(data)
        out.append(struct.pack("<I", masked_crc32c(data)))
    return b"".join(out)


def tfrecord_iter(
    buf: bytes, max_record_bytes: int = MAX_RECORD_BYTES
) -> Iterator[tuple[int, bytes]]:
    """Walk one TFRecord stream -> (record_index, payload). Length-crc
    failure or an over-cap length claim aborts the walk (framing cannot
    be trusted past it); data-crc failure skips that record only; a
    truncated tail is dropped."""
    pos, idx = 0, 0
    n = len(buf)
    while pos + 12 <= n:
        header = buf[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", buf[pos + 8 : pos + 12])
        if masked_crc32c(header) != hcrc or length > max_record_bytes:
            return
        end = pos + 12 + length + 4
        if end > n:
            return  # truncated tail
        data = buf[pos + 12 : pos + 12 + length]
        (dcrc,) = struct.unpack("<I", buf[end - 4 : end])
        if masked_crc32c(data) == dcrc:
            yield idx, data
        idx += 1
        pos = end


TFRECORD_SCHEMA = StructType(
    [
        StructField("shard", StringType(), False),
        StructField("rec_index", IntegerType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload", BinaryType(), False),
    ]
)


def tfrecord_members(raw: DataFrame) -> DataFrame:
    """(path, content) binary rows -> one row per CRC-verified record.
    One Arrow kernel walk per shard, zero shuffles."""

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for idx, payload in tfrecord_iter(bytes(content)):
                    rows.append((str(path), idx, len(payload), payload))
            yield pd.DataFrame(
                rows, columns=[f.name for f in TFRECORD_SCHEMA.fields]
            )

    return raw.select("path", "content").mapInPandas(kernel, TFRECORD_SCHEMA)


# ---------------------------------------------------------------------------
# tf.train.Example (protobuf wire format, dependency-free)
#
#   Example  { Features features = 1; }
#   Features { map<string, Feature> feature = 1; }   // repeated entry msg
#   Feature  { oneof kind { BytesList bytes_list = 1;
#                           FloatList float_list = 2;
#                           Int64List int64_list = 3; } }
#   BytesList { repeated bytes value = 1; }
#   FloatList { repeated float value = 1 [packed = true]; }
#   Int64List { repeated int64 value = 1 [packed = true]; }
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result, shift = 0, 0
    while True:
        if pos >= len(buf):
            raise ValueError("tf.Example: truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("tf.Example: varint overflow")


def _ld(tag_field: int, body: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint((tag_field << 3) | 2) + _varint(len(body)) + body


def _encode_int64(n: int) -> bytes:
    return _varint(n & 0xFFFFFFFFFFFFFFFF)  # two's complement, 10 bytes if <0


def _feature_body(values: list) -> bytes:
    if not values:
        raise ValueError("tf.Example: empty feature value list")
    v0 = values[0]
    if isinstance(v0, bytes):
        body = b"".join(_ld(1, v) for v in values)
        return _ld(1, body)  # bytes_list
    if isinstance(v0, bool):
        raise ValueError("tf.Example: bool feature values are not a tf type")
    if isinstance(v0, int):
        packed = b"".join(_encode_int64(v) for v in values)
        return _ld(3, _ld(1, packed))  # int64_list, packed
    if isinstance(v0, float):
        packed = b"".join(struct.pack("<f", v) for v in values)
        return _ld(2, _ld(1, packed))  # float_list, packed
    raise ValueError(f"tf.Example: unsupported feature type {type(v0)!r}")


def tf_example_encode(features: dict[str, list]) -> bytes:
    """features: name -> list[bytes] | list[int] | list[float]. Keys are
    emitted sorted so the byte output is deterministic (protobuf map
    order is unspecified; sorting pins the export's re-run identity)."""
    entries = []
    for key in sorted(features):
        entry = _ld(1, key.encode("utf-8")) + _ld(2, _feature_body(features[key]))
        entries.append(_ld(1, entry))
    return _ld(1, b"".join(entries))  # Example.features


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    if wire == 0:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire == 1:
        end = pos + 8
    elif wire == 2:
        ln, pos = _read_varint(buf, pos)
        end = pos + ln
    elif wire == 5:
        end = pos + 4
    else:
        raise ValueError(f"tf.Example: unsupported wire type {wire}")
    if end > len(buf):
        raise ValueError("tf.Example: truncated field")
    return end


def _decode_list(buf: bytes, kind: int) -> list:
    """BytesList/FloatList/Int64List body -> python list. Accepts packed
    and unpacked primitive encodings. Every fixed-width read is bounds-
    checked so a CRC-valid but malformed payload raises the module's
    uniform ValueError contract (like the varint paths), never a raw
    struct.error/IndexError from inside the kernel — crawled shard
    corpora are dirty by nature and the caller routes ValueError to its
    bad-record policy."""
    values: list = []
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field != 1:
            pos = _skip_field(buf, pos, wire)
            continue
        if kind == 1:  # bytes
            ln, pos = _read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("tf.Example: truncated field")
            values.append(buf[pos : pos + ln])
            pos += ln
        elif kind == 2:  # float
            if wire == 2:  # packed
                ln, pos = _read_varint(buf, pos)
                if ln % 4 or pos + ln > len(buf):
                    raise ValueError("tf.Example: truncated field")
                values.extend(
                    struct.unpack(f"<{ln // 4}f", buf[pos : pos + ln])
                )
                pos += ln
            elif wire == 5:
                if pos + 4 > len(buf):
                    raise ValueError("tf.Example: truncated field")
                values.append(struct.unpack("<f", buf[pos : pos + 4])[0])
                pos += 4
            else:
                raise ValueError(
                    f"tf.Example: float value with wire type {wire}"
                )
        else:  # int64
            if wire == 2:  # packed
                ln, pos = _read_varint(buf, pos)
                end = pos + ln
                if end > len(buf):
                    raise ValueError("tf.Example: truncated field")
                while pos < end:
                    v, pos = _read_varint(buf, pos)
                    values.append(v - (1 << 64) if v >= 1 << 63 else v)
            elif wire == 0:
                v, pos = _read_varint(buf, pos)
                values.append(v - (1 << 64) if v >= 1 << 63 else v)
            else:
                raise ValueError(
                    f"tf.Example: int64 value with wire type {wire}"
                )
    return values


def _decode_feature(buf: bytes) -> list:
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field in (1, 2, 3) and wire == 2:
            ln, pos = _read_varint(buf, pos)
            return _decode_list(buf[pos : pos + ln], field)
        pos = _skip_field(buf, pos, wire)
    return []


def tf_example_decode(buf: bytes) -> dict[str, list]:
    """Serialized Example -> {name: list}. Unknown fields are skipped by
    wire type (forward-compatible, as protobuf parsers must be)."""
    features: dict[str, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field != 1 or wire != 2:
            pos = _skip_field(buf, pos, wire)
            continue
        ln, pos = _read_varint(buf, pos)
        fbuf, pos = buf[pos : pos + ln], pos + ln
        fpos = 0
        while fpos < len(fbuf):
            ftag, fpos = _read_varint(fbuf, fpos)
            ffield, fwire = ftag >> 3, ftag & 7
            if ffield != 1 or fwire != 2:
                fpos = _skip_field(fbuf, fpos, fwire)
                continue
            eln, fpos = _read_varint(fbuf, fpos)
            entry = fbuf[fpos : fpos + eln]
            fpos += eln
            key, val = None, []
            epos = 0
            while epos < len(entry):
                etag, epos = _read_varint(entry, epos)
                efield, ewire = etag >> 3, etag & 7
                if efield == 1 and ewire == 2:
                    kln, epos = _read_varint(entry, epos)
                    key = entry[epos : epos + kln].decode("utf-8")
                    epos += kln
                elif efield == 2 and ewire == 2:
                    vln, epos = _read_varint(entry, epos)
                    val = _decode_feature(entry[epos : epos + vln])
                    epos += vln
                else:
                    epos = _skip_field(entry, epos, ewire)
            if key is not None:
                features[key] = val
    return features


# ---------------------------------------------------------------------------
# Shard writer (mirrors shards.write_jsonl_shards: deterministic
# assignment, sorted-by-id shards, atomic writes, md5 manifest)
# ---------------------------------------------------------------------------


def write_tfrecord_shards(
    docs: DataFrame,
    out_dir: str,
    docs_per_shard: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    name_prefix: str = "shard-",
    write_manifest: bool = True,
) -> DataFrame:
    """documents -> out_dir/{name_prefix}NNNNN.tfrecord of
    tf.train.Examples ({id_col: Int64List, text_col: BytesList}, utf-8),
    plus _manifest.parquet. Byte-identical across re-runs.
    `name_prefix`/`write_manifest` serve incremental callers (the
    streaming exporter) exactly as in shards.write_jsonl_shards."""
    from spdb_spark.sources.shards import (
        MANIFEST_SCHEMA,
        _atomic_write,
        _ensure_dir,
        _shard_count,
        shard_assignment,
    )

    spark = docs.sparkSession
    n_docs = docs.count()
    n_shards = _shard_count(n_docs, docs_per_shard)
    _ensure_dir(out_dir)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["shard_id"].iloc[0])
        pdf = pdf.sort_values(id_col)
        payloads = [
            tf_example_encode(
                {
                    id_col: [int(i)],
                    text_col: [str(t).encode("utf-8")],
                }
            )
            for i, t in zip(pdf[id_col], pdf[text_col])
        ]
        blob = tfrecord_encode(payloads)
        path = os.path.join(out_dir, f"{name_prefix}{shard_id:05d}.tfrecord")
        _atomic_write(path, blob)
        return pd.DataFrame(
            [
                (
                    shard_id,
                    path,
                    int(len(pdf)),
                    int(len(pdf)),
                    len(blob),
                    hashlib.md5(blob).hexdigest(),
                )
            ],
            columns=[f.name for f in MANIFEST_SCHEMA.fields],
        )

    assigned = docs.withColumn(
        "shard_id", shard_assignment(F.col(id_col).cast("string"), n_shards)
    )
    rows = (
        assigned.groupBy("shard_id")
        .applyInPandas(kernel, MANIFEST_SCHEMA)
        .collect()
    )
    manifest = spark.createDataFrame(rows, MANIFEST_SCHEMA)
    if write_manifest:
        manifest.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "_manifest.parquet")
        )
    return manifest
