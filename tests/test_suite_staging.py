"""Round-7 staged gate queries under the exact driver-gate comparison:
row count + schema names + column-sorted, row-sorted value equality
between the Spark query and its DuckDB oracle on the fixture parquet."""

import duckdb
import pandas as pd
import pytest

from spdb_spark.suite_staging import STAGED
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


@pytest.mark.parametrize("name", list(STAGED))
def test_staged_gate_exact(spark, name):
    fn, sql = STAGED[name]
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
            )  # EXACT float equality — the gate hashes values
        else:
            assert (a.values == b.values).all(), (name, c)
