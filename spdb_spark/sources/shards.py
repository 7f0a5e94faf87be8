"""Training-shard EXPORT: the last mile of the curation pipeline.

A curated corpus leaves the engine as shard files — WebDataset tar (or
zip) shards for multimodal samples, gzipped JSONL for text — because
that is what training loaders stream. This module writes them with the
three properties that matter at corpus scale:

- **Deterministic, partitioning-invariant layout.** Shard assignment is
  content-addressed (md5 of the sample key modulo the shard count) and
  members are sorted within a shard, so the same logical corpus produces
  byte-identical shards no matter how the input DataFrame was
  partitioned or which executor wrote which file. Re-runs are diffable.
- **One exchange.** The only shuffle is the groupBy(shard_id); each
  shard is then assembled and written by ONE Arrow kernel invocation
  (`applyInPandas`), bounded in memory by the shard size you chose.
- **Atomic files.** Kernels write `.tmp-` names and rename into place,
  so a killed job never leaves a half-written shard under a final name;
  a manifest (one row per shard: path, counts, bytes, md5) is returned
  and written beside the shards.
- **Shared-storage writes.** Shard kernels run ON EXECUTORS, so the
  output path must be visible to every executor AND the reader. A
  scheme'd URI (`s3://…`, `hdfs://…`, `file:///mnt/shared/…`) routes
  through `pyarrow.fs.FileSystem.from_uri` — the write lands in the
  shared store no matter which machine ran the kernel. A bare OS path
  uses plain local I/O and is correct ONLY when executors share a
  filesystem with the driver (local mode, NFS/Lustre clusters); on a
  cluster with executor-local disks a bare path scatters shards across
  machines — use a URI there.

Round-trips close the loop with the ingest surface: tar/zip shards read
back via sources/webdataset.py / zipshard.py, JSONL via
sources/corpus.ingest_jsonl_files.
"""

from __future__ import annotations

import gzip
import hashlib
import json
import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from spdb_spark.functions.hashing import md5_long

MANIFEST_SCHEMA = StructType(
    [
        StructField("shard_id", LongType(), False),
        StructField("path", StringType(), False),
        StructField("n_samples", LongType(), False),
        StructField("n_members", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("md5", StringType(), False),
    ]
)


_URI_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")


def _tmp_suffix() -> str:
    """Collision-proof across hosts AND retries: pid alone repeats
    across a multi-host cluster (and a speculative re-attempt of the
    same task shares neither pid nor uuid with the original, so the
    two attempts never clobber each other's tmp object)."""
    import socket
    import uuid

    return f"{socket.gethostname()}-{os.getpid()}-{uuid.uuid4().hex[:12]}"


def _atomic_write(path: str, data: bytes) -> None:
    """Write-then-rename so a killed task never leaves a half-written
    shard under a final name. Scheme'd URIs go through pyarrow.fs (the
    executor writes to SHARED storage: object store close() completes
    the upload atomically, HDFS move() is atomic); bare paths use local
    I/O (valid only on a shared filesystem — module docstring).

    Object-store caveat: pyarrow's move() on S3-like stores is
    copy+delete, so a task killed between copy and delete can orphan a
    `.tmp-*` object. Orphans never shadow a final shard name (the
    suffix is host+pid+uuid) — sweep `.tmp-*` keys with a lifecycle
    rule or a post-run cleanup if the bucket must stay tidy."""
    if _URI_SCHEME_RE.match(path):
        import pyarrow.fs as pafs

        fs, p = pafs.FileSystem.from_uri(path)
        d, b = p.rsplit("/", 1) if "/" in p else ("", p)
        t = f".tmp-{b}-{_tmp_suffix()}"
        tmp = f"{d}/{t}" if d else t
        with fs.open_output_stream(tmp) as f:
            f.write(data)
        fs.move(tmp, p)
        return
    tmp = os.path.join(
        os.path.dirname(path), f".tmp-{os.path.basename(path)}-{_tmp_suffix()}"
    )
    with open(tmp, "wb") as f:
        f.write(data)
    os.rename(tmp, path)


def _ensure_dir(out_dir: str) -> None:
    if _URI_SCHEME_RE.match(out_dir):
        import pyarrow.fs as pafs

        fs, p = pafs.FileSystem.from_uri(out_dir)
        fs.create_dir(p, recursive=True)
    else:
        os.makedirs(out_dir, exist_ok=True)


def _shard_count(n_keys: int, per_shard: int) -> int:
    return max(1, (n_keys + per_shard - 1) // per_shard)



def shard_assignment(key, n_shards: int):
    """Content-addressed shard id for a string key Column: md5-derived,
    uniform by construction, independent of row order and partitioning —
    the single expression both shard writers key their groupBy on (and
    the gate query replays against a DuckDB twin)."""
    return F.pmod(md5_long(key), F.lit(n_shards))


def shard_assignment_sql(expr: str, n_shards: int) -> str:
    """DuckDB SQL computing the identical shard id."""
    from spdb_spark.functions.hashing import md5_long_sql

    return f"({md5_long_sql(expr)} % {n_shards})"


def write_webdataset_shards(
    members: DataFrame,
    out_dir: str,
    samples_per_shard: int = 1000,
    container: str = "tar",
    compress: bool = False,
) -> DataFrame:
    """members (key, ext, payload) -> out_dir/shard-NNNNN.{tar[.gz]|zip}
    plus _manifest.parquet; returns the manifest DataFrame.

    Samples (all members of one key) never split across shards: the
    shard is a pure function of the key hash."""
    if container not in ("tar", "zip"):
        raise ValueError("container must be 'tar' or 'zip'")
    spark = members.sparkSession
    n_keys = members.select("key").distinct().count()
    n_shards = _shard_count(n_keys, samples_per_shard)
    _ensure_dir(out_dir)
    ext = ("tar.gz" if compress else "tar") if container == "tar" else "zip"

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        from spdb_spark.sources.webdataset import wds_encode
        from spdb_spark.sources.zipshard import zip_encode

        shard_id = int(pdf["shard_id"].iloc[0])
        samples: dict[str, dict[str, bytes]] = {}
        for row in pdf.itertuples(index=False):
            samples.setdefault(row.key, {})[row.ext] = bytes(row.payload)
        blob = (
            wds_encode(samples, compress=compress)
            if container == "tar"
            else zip_encode(samples, compress=compress)
        )
        path = os.path.join(out_dir, f"shard-{shard_id:05d}.{ext}")
        _atomic_write(path, blob)
        return pd.DataFrame(
            [
                (
                    shard_id,
                    path,
                    len(samples),
                    int(len(pdf)),
                    len(blob),
                    hashlib.md5(blob).hexdigest(),
                )
            ],
            columns=[f.name for f in MANIFEST_SCHEMA.fields],
        )

    assigned = members.withColumn(
        "shard_id", shard_assignment(F.col("key"), n_shards)
    )
    rows = (
        assigned.groupBy("shard_id")
        .applyInPandas(kernel, MANIFEST_SCHEMA)
        .collect()  # one row per shard: bounded, and it drives the write
    )
    manifest = spark.createDataFrame(rows, MANIFEST_SCHEMA)
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "_manifest.parquet")
    )
    return manifest


def write_jsonl_shards(
    docs: DataFrame,
    out_dir: str,
    docs_per_shard: int = 10_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    name_prefix: str = "shard-",
    write_manifest: bool = True,
) -> DataFrame:
    """documents -> out_dir/{name_prefix}NNNNN.jsonl.gz (one JSON object
    per line, docs sorted by id within a shard, mtime pinned in the gzip
    header so re-runs are byte-identical) plus _manifest.parquet.
    `name_prefix`/`write_manifest` let incremental callers (the
    streaming exporter) namespace per-batch shards and own the manifest
    lifecycle themselves."""
    spark = docs.sparkSession
    n_docs = docs.count()
    n_shards = _shard_count(n_docs, docs_per_shard)
    _ensure_dir(out_dir)
    cols = docs.columns

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        shard_id = int(pdf["shard_id"].iloc[0])
        pdf = pdf.sort_values(id_col)
        lines = []
        for row in pdf.itertuples(index=False):
            obj = {
                c: (v.item() if hasattr(v, "item") else v)  # numpy -> native
                for c, v in ((c, getattr(row, c)) for c in cols)
            }
            lines.append(json.dumps(obj, sort_keys=True, ensure_ascii=False))
        blob = gzip.compress(("\n".join(lines) + "\n").encode(), mtime=0)
        path = os.path.join(out_dir, f"{name_prefix}{shard_id:05d}.jsonl.gz")
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
        "shard_id",
        shard_assignment(F.col(id_col).cast("string"), n_shards),
    )
    rows = (
        assigned.groupBy("shard_id").applyInPandas(kernel, MANIFEST_SCHEMA).collect()
    )
    manifest = spark.createDataFrame(rows, MANIFEST_SCHEMA)
    if write_manifest:
        manifest.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, "_manifest.parquet")
        )
    return manifest
