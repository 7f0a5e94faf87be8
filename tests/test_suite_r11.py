"""Round-11 gate queries under the exact driver-gate comparison (row
count + schema names + column-sorted, row-sorted value equality between
the Spark query and its DuckDB oracle on the fixture parquet), plus the
registration/rotation assertions every registration round pins."""

import duckdb
import pandas as pd
import pytest

from spdb_spark.suite_llm import STAGED_R11_LLM
from tests.conftest import SF_DIR

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(sorted(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", list(STAGED_R11_LLM))
def test_r11_gate_exact(spark, name):
    fn, sql = STAGED_R11_LLM[name]
    got = _canon(fn(spark, SF_DIR).toPandas())
    want = _canon(_oracle(sql))
    assert list(got.columns) == list(want.columns), name
    assert len(got) == len(want), name
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert (a.astype(float).values == b.astype(float).values).all(), (
                name,
                c,
            )
        else:
            assert (a.values == b.values).all(), (name, c)


def test_r11_registration_landed():
    """The r11 entries live in the registry with their exact (fn, sql)
    pairs; until a CORRECTNESS file records them, the rotation places
    them inside the driver's next 50-query window."""
    import spdb_spark.suite as suite

    for name, (fn, sql) in STAGED_R11_LLM.items():
        assert suite._BASE.get(name) == (fn, sql), f"not registered: {name}"
        assert callable(fn) and isinstance(sql, str) and sql.strip()

    last = suite._last_checked_round()
    window = list(suite.REGISTRY)[:50]
    for name in STAGED_R11_LLM:
        if last.get(name, 0) == 0:
            assert name in window, f"{name} missed the next rotation window"


def test_appended_gate_shares_full_build_oracle():
    """llm_ann_ivfpq_appended intentionally registers the SAME oracle
    SQL as llm_ann_ivfpq: the driver comparison is the append==rebuild
    proof. Pin the aliasing so a future oracle edit can't silently split
    them."""
    from spdb_spark.suite_llm import SQL_ANN_IVFPQ, STAGED_R11_LLM

    assert STAGED_R11_LLM["llm_ann_ivfpq_appended"][1] is SQL_ANN_IVFPQ


def test_stream_gate_shares_batch_oracle():
    """llm_dedup_semantic_stream intentionally registers the SAME oracle
    SQL as llm_dedup_semantic: the driver comparison is the stream==batch
    proof (the llm_crawl_corpus_stream pattern)."""
    from spdb_spark.suite_llm import SQL_DEDUP_SEMANTIC, STAGED_R11_LLM

    assert STAGED_R11_LLM["llm_dedup_semantic_stream"][1] is SQL_DEDUP_SEMANTIC


def test_bloom_stream_gate_shares_batch_oracle():
    """llm_bloom_membership_stream registers the SAME oracle SQL as
    llm_bloom_membership: the driver comparison is the stream==batch
    bitmap proof."""
    from spdb_spark.suite_llm import SQL_BLOOM_MEMBERSHIP, STAGED_R11_LLM

    assert (
        STAGED_R11_LLM["llm_bloom_membership_stream"][1]
        is SQL_BLOOM_MEMBERSHIP
    )


def test_countmin_stream_gate_shares_batch_oracle():
    """llm_countmin_vocab_stream registers the SAME oracle SQL as
    llm_countmin_vocab: the driver comparison is the stream==batch
    proof, and — because count-min's fold is a SUM, not an idempotent
    OR — the driver-level witness that the ledger (not the algebra)
    provides exactly-once."""
    from spdb_spark.suite_llm import SQL_COUNTMIN_VOCAB, STAGED_R11_LLM

    assert (
        STAGED_R11_LLM["llm_countmin_vocab_stream"][1] is SQL_COUNTMIN_VOCAB
    )


def test_ivfpq_gates_share_exact_oracles():
    """llm_ann_ivfpq_stream shares the batch IVF-PQ oracle (stream==
    batch-rebuild proof); llm_ann_ivfpq_filtered fully escalates by
    construction, so it shares the IVF filtered gate's exact
    brute-force oracle."""
    from spdb_spark.suite_llm import (
        SQL_ANN_FILTERED,
        SQL_ANN_IVFPQ,
        STAGED_R11_LLM,
    )

    assert STAGED_R11_LLM["llm_ann_ivfpq_stream"][1] is SQL_ANN_IVFPQ
    assert STAGED_R11_LLM["llm_ann_ivfpq_filtered"][1] is SQL_ANN_FILTERED
