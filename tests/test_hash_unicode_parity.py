"""Cross-engine md5 parity on NON-ASCII keys for the r11 protocol
families (Bloom positions, count-min buckets, HyperBall registers).
The driver fixtures are ASCII-only, so without this pin a UTF-8
encoding divergence between Spark, DuckDB, and the replicas would be
invisible until real multilingual data hit the operators."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from spdb_spark.functions.hashing import md5_long, md5_long_sql
from spdb_spark.functions.membership import (
    bloom_positions,
    bloom_positions_sql,
)
from spdb_spark.functions.sketch import countmin_bucket_sql

KEYS = [
    "ascii-key",
    "clé-française",
    "ключ-русский",
    "鍵-日本語",
    "🔑emoji",
    "mixed-混合-ключ",
    "nfc-é",  # U+00E9 precomposed
    "nfd-é",  # e + combining acute: different bytes, must differ
]


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[0:15], 16)


@pytest.fixture(scope="module")
def kdf(spark):
    return spark.createDataFrame([(i, k) for i, k in enumerate(KEYS)],
                                 "i long, key string")


def test_md5_long_three_way(spark, kdf):
    got_spark = {
        r.key: r.h
        for r in kdf.select("key", md5_long(F.col("key")).alias("h")).collect()
    }
    con = duckdb.connect()
    con.register("t", kdf.toPandas())
    got_duck = dict(
        con.execute(f"SELECT key, {md5_long_sql('key')} FROM t").fetchall()
    )
    for k in KEYS:
        assert got_spark[k] == _md5_60(k) == got_duck[k], k
    # NFC vs NFD are different byte strings -> different hashes
    assert got_spark["nfc-é"] != got_spark["nfd-é"]


def test_bloom_positions_three_way(spark, kdf):
    m, kk = 600, 3

    def ref(s):
        h = hashlib.md5(s.encode()).hexdigest()
        h1 = int(h[0:15], 16) % m
        g = (int(h[16:31], 16) % m) | 1
        return [(h1 + i * g) % m for i in range(kk)]

    got = {
        r.key: list(r.pos)
        for r in kdf.select(
            "key", bloom_positions(F.col("key"), m, kk).alias("pos")
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", kdf.toPandas())
    duck = dict(
        con.execute(
            f"SELECT key, {bloom_positions_sql('key', m, kk)} FROM t"
        ).fetchall()
    )
    for k in KEYS:
        assert got[k] == ref(k) == list(duck[k]), k


def test_countmin_buckets_three_way(spark, kdf):
    w = 64
    con = duckdb.connect()
    con.register("t", kdf.toPandas())
    for r in range(3):
        got = {
            row.key: row.b
            for row in kdf.select(
                "key",
                (md5_long(F.concat(F.lit(f"{r}:"), F.col("key"))) % w).alias(
                    "b"
                ),
            ).collect()
        }
        duck = dict(
            con.execute(
                f"SELECT key, {countmin_bucket_sql('key', r, w)} FROM t"
            ).fetchall()
        )
        for k in KEYS:
            want = _md5_60(f"{r}:{k}") % w
            assert got[k] == want == duck[k], (k, r)


def test_hyperball_register_derivation_unicode(spark):
    from spdb_spark.functions.graph import hyperball

    # edges between unicode hosts: the whole register pipeline must run
    edges = spark.createDataFrame(
        [(KEYS[i], KEYS[(i + 1) % len(KEYS)]) for i in range(len(KEYS))],
        "src string, dst string",
    )
    rows = hyperball(edges, iterations=2).collect()
    assert {r.node for r in rows} == set(KEYS)
    assert all(r.reach > 0 for r in rows)
