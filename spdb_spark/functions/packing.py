"""Sequence packing: assign documents to fixed-token-budget training
sequences, deterministically and in parallel.

A pretraining pipeline concatenates documents into fixed-length training
examples. A naive global greedy pack is a single-threaded scan — useless at
100 TB. This packs in two levels instead:

1. Each doc gets a deterministic hash bucket (`md5_long(salt||id) % n_buckets`)
   — buckets are independent packing domains, so the window below
   parallelizes across `n_buckets` partitions and the assignment is a pure
   function of the doc ids (stable across runs/engines/partitioning).
2. Within a bucket, docs are ordered by (hash, id) — a reproducible
   pseudo-random order — and a running token offset assigns each doc to the
   sequence where it STARTS: `seq = floor(offset_before_doc / budget)`.
   (Offset packing: a doc straddling a boundary belongs to the sequence it
   starts in, mirroring how concat-then-chunk tokenization slices.)

One shuffle (the per-bucket window sort); no UDF, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spdb_spark.functions.hashing import md5_long


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_buckets: int = 32,
    salt: str = "pack",
) -> DataFrame:
    """Add (bucket, seq_id, seq_offset) to each row. `token_col` is the
    doc's token count; `budget` the per-sequence token capacity."""
    h = md5_long(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    out = df.withColumn("_h", h).withColumn(
        "bucket", (F.col("_h") % n_buckets).cast("long")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = (F.sum(F.col(token_col)).over(w) - F.col(token_col)).alias("seq_offset")
    return (
        out.select("*", offset)
        .withColumn("seq_id", F.floor(F.col("seq_offset") / budget).cast("long"))
        .drop("_h")
    )


def sequence_stats(packed: DataFrame, token_col: str) -> DataFrame:
    """Per-sequence fill report: docs per sequence and total tokens."""
    return packed.groupBy("bucket", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.col(token_col)).cast("long").alias("seq_tokens"),
    )


def materialize_sequences(packed: DataFrame, id_col: str, token_col: str) -> DataFrame:
    """Emit the composed training sequences: per (bucket, seq_id), the
    doc ids in concatenation order plus the token total. Order inside a
    sequence is the deterministic packing order (seq_offset), carried by
    sorting (offset, id) structs inside the aggregate — `bucket` is a
    prefix of the group key, so this reuses the packing window's
    exchange (no extra shuffle)."""
    return (
        packed.groupBy("bucket", "seq_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("seq_offset").alias("o"), F.col(id_col).alias("i")
                        )
                    )
                ),
                lambda s: s["i"],
            ).alias("doc_ids"),
            F.sum(F.col(token_col)).cast("long").alias("seq_tokens"),
        )
    )
