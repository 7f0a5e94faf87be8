"""Morton encode/decode parity with the reference algorithm.

The expected values come from an independent straight-from-the-definition
bit-interleave (21 triads, x bit 0 / y bit 1 / z bit 2 — the documented
semantics of zindex.c:27-68), NOT from the magic-mask implementation under
test, so the two can't be wrong together.
"""

import random

from pyspark.sql import functions as F

from spdb_spark.morton import (
    morton_decode,
    morton_encode,
    morton_encode_sql,
    morton_xyz,
    xyz_morton,
)


def naive_morton(x: int, y: int, z: int) -> int:
    m = 0
    for i in range(21):
        m |= ((x >> i) & 1) << (3 * i)
        m |= ((y >> i) & 1) << (3 * i + 1)
        m |= ((z >> i) & 1) << (3 * i + 2)
    return m


CASES = [
    (0, 0, 0),
    (1, 0, 0),
    (0, 1, 0),
    (0, 0, 1),
    (1, 1, 1),
    (7, 5, 3),
    (2**21 - 1, 2**21 - 1, 2**21 - 1),
    (123456, 654321, 98765),
]
random.seed(7)
CASES += [
    (random.randrange(2**21), random.randrange(2**21), random.randrange(2**21))
    for _ in range(50)
]


def test_python_scalar_parity():
    for x, y, z in CASES:
        expected = naive_morton(x, y, z)
        assert xyz_morton(x, y, z) == expected
        assert morton_xyz(expected) == (x, y, z)


def test_spark_column_parity(spark):
    df = spark.createDataFrame(CASES, "x long, y long, z long")
    out = df.select(
        "x",
        "y",
        "z",
        morton_encode(F.col("x"), F.col("y"), F.col("z")).alias("m"),
    )
    dx, dy, dz = morton_decode(F.col("m"))
    out = out.select("*", dx.alias("rx"), dy.alias("ry"), dz.alias("rz"))
    for row in out.collect():
        assert row.m == naive_morton(row.x, row.y, row.z)
        assert (row.rx, row.ry, row.rz) == (row.x, row.y, row.z)


def test_sql_text_parity():
    import duckdb

    con = duckdb.connect()
    for x, y, z in CASES[:20]:
        expr = morton_encode_sql(str(x), str(y), str(z))
        got = con.execute(f"SELECT {expr}").fetchone()[0]
        assert got == naive_morton(x, y, z)
