"""Morton (Z-order) encode/decode.

Functional parity with the reference's zindex (spdb/c_lib/c_version/zindex.c:27-68):
interleave the low 21 bits of (x, y, z) cuboid-grid coordinates into a 63-bit
code, x in bit 0 of each triad, y in bit 1, z in bit 2.

Implementation is Spark-first: a pure Column expression built from the classic
parallel-prefix bit-spread (5 shift/mask steps per axis — public
"bit-twiddling hacks" / libmorton technique), so encoding runs JVM-side inside
whole-stage codegen; no UDF, no Python in the hot path. The same expression is
emitted as ANSI SQL text for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Parallel bit-spread: x -> x with two zero bits between each of its 21 bits.
# (shift, mask) pairs; applying `v = (v | v << shift) & mask` in order spreads
# the bits. Standard 64-bit 3D-Morton magic constants (public domain).
_SPREAD_STEPS = (
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
)

# Inverse (compact) steps: `v = (v ^ (v >> shift)) & mask`.
_COMPACT_STEPS = (
    (2, 0x10C30C30C30C30C3),
    (4, 0x100F00F00F00F00F),
    (8, 0x1F0000FF0000FF),
    (16, 0x1F00000000FFFF),
    (32, 0x1FFFFF),
)

_AXIS_MASK = 0x1FFFFF  # low 21 bits


def _spread_col(c: Column) -> Column:
    v = c.cast("long").bitwiseAND(F.lit(_AXIS_MASK))
    for shift, mask in _SPREAD_STEPS:
        v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
    return v


def _compact_col(c: Column) -> Column:
    v = c.cast("long").bitwiseAND(F.lit(0x1249249249249249))
    for shift, mask in _COMPACT_STEPS:
        v = (v.bitwiseXOR(F.shiftright(v, shift))).bitwiseAND(F.lit(mask))
    return v


def morton_encode(x: Column, y: Column, z: Column) -> Column:
    """Column expression: 63-bit Morton code of three 21-bit coordinates."""
    return (
        _spread_col(x)
        .bitwiseOR(F.shiftleft(_spread_col(y), 1))
        .bitwiseOR(F.shiftleft(_spread_col(z), 2))
    )


def morton_decode(m: Column) -> tuple[Column, Column, Column]:
    """Column expressions: (x, y, z) from a Morton code."""
    return (
        _compact_col(m),
        _compact_col(F.shiftright(m, 1)),
        _compact_col(F.shiftright(m, 2)),
    )


# ---------------------------------------------------------------------------
# Driver-side reference implementation (planning, tests, oracle generation).
# ---------------------------------------------------------------------------

def _spread_py(v: int) -> int:
    v &= _AXIS_MASK
    for shift, mask in _SPREAD_STEPS:
        v = (v | (v << shift)) & mask
    return v


def _compact_py(v: int) -> int:
    v &= 0x1249249249249249
    for shift, mask in _COMPACT_STEPS:
        v = (v ^ (v >> shift)) & mask
    return v


def xyz_morton(x: int, y: int, z: int) -> int:
    """Python scalar: Morton code of (x, y, z) — parity with zindex.c:27-49."""
    return _spread_py(x) | (_spread_py(y) << 1) | (_spread_py(z) << 2)


def morton_xyz(m: int) -> tuple[int, int, int]:
    """Python scalar: (x, y, z) from Morton code — parity with zindex.c:53-68."""
    return _compact_py(m), _compact_py(m >> 1), _compact_py(m >> 2)


# ---------------------------------------------------------------------------
# ANSI-SQL text (DuckDB-compatible) for oracle queries.
# ---------------------------------------------------------------------------

def _spread_sql(expr: str) -> str:
    # DuckDB raises on left-shift overflow (the C algorithm relies on bit
    # discard), so mask the operand down to the bits that survive the
    # post-shift mask before shifting: (v & (mask >> s)) << s == (v << s) & mask.
    v = f"(CAST({expr} AS BIGINT) & {_AXIS_MASK})"
    for shift, mask in _SPREAD_STEPS:
        v = f"(({v} | (({v} & {mask >> shift}) << {shift})) & {mask})"
    return v


def morton_encode_sql(x_expr: str, y_expr: str, z_expr: str) -> str:
    """SQL text computing the same Morton code (for the DuckDB oracle)."""
    return (
        f"({_spread_sql(x_expr)} | ({_spread_sql(y_expr)} << 1)"
        f" | ({_spread_sql(z_expr)} << 2))"
    )
