"""Streaming quality-classifier scoring: apply a FROZEN hashed n-gram
linear model (functions/classifier.py — trained offline via
nb_classifier_weights or an external fastText export) to a document
stream.

Same design as streaming/dsir.py: the weight table is at most
`n_buckets` rows, so it freezes into a dense float64 LUT shipped inside
ONE stateless Arrow kernel — per-row scoring, no shuffle, no state
store. The batch scorer's groupBy(doc) cannot stream (a per-doc
aggregate over a non-time key); per-row computation is the streaming
form and is exactly equal by construction.

Parity notes (pinned in tests): same tokenization as the batch path
(lower, strip ' ' only, split on \\s+), same md5 bucket hash, and the
classifier's LEFT-join semantics — a gram whose bucket carries no
weight contributes 0 to the sum but COUNTS in the mean's denominator
(unlike DSIR's inner-join scoring). n_grams and score are EXACTLY equal
to the batch scorer; prob passes through exp(), where Python's libm and
the JVM differ in the final ulp (~1e-17) — compare prob with a 1e-12
tolerance, or threshold on score."""

from __future__ import annotations

import hashlib
import math
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, LongType, StructField

_WS = re.compile(r"\s+")

SCORE_FIELDS = [
    StructField("n_grams", LongType(), False),
    StructField("score", DoubleType(), True),
    StructField("prob", DoubleType(), True),
]


def classifier_lut(weights: DataFrame, n_buckets: int) -> np.ndarray:
    """Collect the (bucket, weight) table (bounded: <= n_buckets rows)
    into a dense LUT; absent buckets are 0 (the left-join semantics)."""
    vals = np.zeros(n_buckets, np.float64)
    for r in weights.collect():
        vals[int(r["bucket"])] = float(r["weight"])
    return vals


def classifier_score_stream(
    df: DataFrame,
    lut: np.ndarray,
    n_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bias: float = 0.0,
) -> DataFrame:
    """(id, ..., text) rows -> (id, n_grams, score, prob) via one
    stateless Arrow kernel; identical on batch and streaming frames.
    Zero-gram docs score NULL (the batch scorer emits no row — filter
    on n_grams > 0 for strict parity)."""
    from pyspark.sql.types import StructType

    schema = StructType(
        [df.schema[id_col]] + SCORE_FIELDS
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ns, scores, probs = [], [], [], []
            for row_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = _WS.split((text or "").strip(" ").lower())
                grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
                s = 0.0
                for g in grams:
                    b = int(
                        hashlib.md5(g.encode()).hexdigest()[:15], 16
                    ) % n_buckets
                    s += lut[b]
                n = len(grams)
                ids.append(row_id)
                ns.append(n)
                if n:
                    score = bias + s / n
                    scores.append(score)
                    probs.append(1.0 / (1.0 + math.exp(-score)))
                else:
                    scores.append(None)
                    probs.append(None)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_grams": ns,
                    "score": scores,
                    "prob": probs,
                }
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
