"""Streaming DSIR scoring: attach importance weights to a document
stream using a FROZEN log-ratio model fit offline by
`functions/dsir.dsir_bucket_logratio`.

The batch scorer (`dsir_weights`) is explode -> broadcast join ->
groupBy(doc) — but a per-doc aggregate on an unbounded stream would need
a watermark over a key that isn't time. A frozen model makes scoring
STATELESS instead: the log-ratio table is at most `n_buckets` rows, so
it ships to every task as a dense float64 LUT inside one Arrow kernel,
and each document's weight is computed within its own row. No shuffle,
no state store — the stage scales exactly like the quality stream.

Parity with the batch scorer is exact by construction and pinned in
tests: same tokenization (lower, space-trim, split on ``\\s+`` — NOTE
Spark's `trim` strips 0x20 only, so the kernel uses ``strip(' ')``, not
Python's all-whitespace `strip()`), same unigram+bigram features, same
md5 bucket hash, and the same INNER-join semantics (grams whose bucket
never occurred in either fit corpus contribute neither weight nor
count)."""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_WS = re.compile(r"\s+")

SCORE_FIELDS = [
    StructField("log_weight", DoubleType(), True),
    StructField("n_grams", LongType(), False),
]


def dsir_logratio_lut(
    logratio: DataFrame, n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """Collect the fit (bounded: <= n_buckets rows) into a dense
    (values, present) LUT pair for the streaming kernel."""
    vals = np.zeros(n_buckets, np.float64)
    present = np.zeros(n_buckets, bool)
    for r in logratio.collect():
        vals[int(r["bucket"])] = float(r["logratio"])
        present[int(r["bucket"])] = True
    return vals, present


def _score_text(
    text: str, vals: np.ndarray, present: np.ndarray, n_buckets: int
) -> tuple[float, int]:
    toks = _WS.split((text or "").strip(" ").lower())
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    lw, n = 0.0, 0
    for g in grams:
        b = int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets
        if present[b]:
            lw += vals[b]
            n += 1
    return lw, n


def dsir_score_stream(
    df: DataFrame,
    lut: tuple[np.ndarray, np.ndarray],
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, ..., text) rows -> (id, log_weight, n_grams) via one
    stateless Arrow kernel. Works identically on batch and streaming
    frames; on a stream it adds zero state and no shuffle."""
    vals, present = lut
    in_field = df.schema[id_col]
    schema = StructType([in_field] + SCORE_FIELDS)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                lw, n = _score_text(
                    getattr(row, text_col), vals, present, n_buckets
                )
                out.append((getattr(row, id_col), lw if n else None, n))
            yield pd.DataFrame(
                out, columns=[id_col, "log_weight", "n_grams"]
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
