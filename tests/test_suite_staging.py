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


def test_registration_readiness():
    """Round-7 registration is 'copy STAGED into suite_llm.QUERIES':
    simulate it against the rotation logic and the driver contract so
    the one-line change cannot surprise.

    Pins: (a) no staged name collides with a registered one, (b) every
    staged entry is (callable, SQL string), (c) after a simulated merge
    the rotation puts all never-checked (staged) names inside the next
    50-query window, and no currently-registered name is lost."""
    import spdb_spark.suite as suite

    merged = dict(suite._BASE)
    for name, (fn, sql) in STAGED.items():
        assert name not in merged, f"name collision: {name}"
        assert callable(fn) and isinstance(sql, str) and sql.strip()
        merged[name] = (fn, sql)

    last = suite._last_checked_round()
    pos = {name: i for i, name in enumerate(merged)}
    ordered = sorted(merged, key=lambda n: (last.get(n, 0), pos[n]))
    window = ordered[:50]
    assert len(STAGED) <= 50
    for name in STAGED:
        assert name in window, f"{name} missed the next rotation window"
    assert set(merged) == set(suite._BASE) | set(STAGED)
