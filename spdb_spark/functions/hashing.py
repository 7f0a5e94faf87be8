"""Engine-portable deterministic hashing.

The driver gate compares Spark against DuckDB, whose built-in 64-bit hashes
differ (xxhash64 vs DuckDB's), so dedup/LSH operators use a 60-bit integer
derived from md5 (identical hex in both engines):

    Spark : cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)
    DuckDB: CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)

md5 here is a deterministic spreading function, not a security primitive.
All hashing stays JVM-side (built-in md5/conv — no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(c: Column) -> Column:
    """60-bit non-negative hash of a string column (JVM-side)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB SQL computing the identical hash."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"
