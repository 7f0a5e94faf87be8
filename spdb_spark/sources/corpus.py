"""Text-corpus sources: get raw crawl/corpus files into the `documents`
schema (doc_id, text, lang, source, n_chars) that every curation operator
consumes.

Readers are distributed scans (spark.read.text/json — splittable, no
driver materialization). Document ids are content-addressed and
deterministic: md5_long(file ‖ md5(text) ‖ occurrence) — identical texts
within one file get occurrence-disambiguated ids, so exact duplicates
survive ingest (the dedup operators are what remove them, by policy) and
re-running ingest over the same files yields the same id multiset
regardless of partitioning. No rand(), no monotonically_increasing_id
(both are partitioning-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spdb_spark.functions.hashing import md5_long
from spdb_spark.functions.text import lang_id


def _finalize(df: DataFrame) -> DataFrame:
    """df: (file, text) -> documents schema with deterministic ids."""
    w = Window.partitionBy("file", F.md5("text")).orderBy(F.lit(1))
    return (
        df.withColumn("occ", F.row_number().over(w))
        .select(
            md5_long(
                F.concat_ws("\x1f", "file", F.md5("text"), F.col("occ").cast("string"))
            ).alias("doc_id"),
            "text",
            lang_id(F.col("text")).alias("lang"),
            F.regexp_extract("file", r"([^/]+?)(\.[a-zA-Z0-9]+)?$", 1).alias(
                "source"
            ),
            F.length("text").cast("int").alias("n_chars"),
        )
    )


def ingest_text_files(spark: SparkSession, path: str) -> DataFrame:
    """One document per line of each matched text file."""
    raw = spark.read.text(path).select(
        F.input_file_name().alias("file"), F.col("value").alias("text")
    )
    return _finalize(raw.where(F.length(F.trim("text")) > 0))


def ingest_jsonl_files(
    spark: SparkSession, path: str, text_field: str = "text"
) -> DataFrame:
    """One document per JSON line; `text_field` selects the payload key.
    Rows without the field (malformed lines) are dropped, not errored —
    crawl files are dirty by nature."""
    raw = (
        spark.read.json(path)
        .withColumn("file", F.input_file_name())
        .where(F.col(text_field).isNotNull())
        .select("file", F.col(text_field).cast("string").alias("text"))
    )
    return _finalize(raw)
