"""Z-order (Morton) spatial locality keys: interleave the bits of the
quad-cell coordinates so that spatially adjacent cells get numerically
adjacent keys.

The 100-TB reason this exists: range-partitioning / sorting a spatial
table by ``morton_key`` co-locates neighboring tiles in the same
parquet files, so a bbox scan prunes to O(few) row groups instead of
touching the whole table — the standard lakehouse Z-ORDER layout
optimization, expressed as a plain Column so Catalyst folds it and
``repartitionByRange(morton)`` / ``sortWithinPartitions`` consume it
directly.

Pure 64-bit integer magic-number spreads (the classic bit-twiddling
identity), identical in Spark and DuckDB: every intermediate stays
below 2^62 for coords < 2^30 (z <= 30), so DuckDB's overflow-checked
``<<`` never trips (CLAUDE.md simhash note).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (shift, mask) stages spreading a 32-bit value over 64 bits with one
# zero bit between every payload bit
_STAGES = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]

MAX_Z = 30  # keeps spread(y) << 1 below bit 63 (BIGINT sign)


def spread_bits(v: Column) -> Column:
    # BIGINT up front: shiftleft preserves IntegerType, so an int32
    # input would silently wrap at the first v<<16 stage once coords
    # reach 2^16 (z >= 16) — the z<=30 guard checks the zoom, this cast
    # makes it sufficient for any input column type (ADVICE r5)
    v = v.cast("long")
    for sh, m in _STAGES:
        v = v.bitwiseOR(F.shiftleft(v, sh)).bitwiseAND(F.lit(m))
    return v


def morton_key(cx: Column, cy: Column, z: int) -> Column:
    """Interleaved key for cell (cx, cy) at zoom ``z`` (z <= 30)."""
    if z > MAX_Z:
        raise ValueError(f"z={z} > {MAX_Z}: morton key would overflow BIGINT")
    return spread_bits(cx).bitwiseOR(F.shiftleft(spread_bits(cy), 1))


def python_morton(cx: int, cy: int) -> int:
    """Plain-Python reference (bit-by-bit, independent formulation)."""
    out = 0
    for i in range(32):
        out |= ((cx >> i) & 1) << (2 * i)
        out |= ((cy >> i) & 1) << (2 * i + 1)
    return out


# ----- SQL twin (DuckDB) --------------------------------------------------


def sql_spread(expr: str) -> str:
    """Pass a SIMPLE column reference: each stage doubles the text, so
    a computed expression would appear 2^5 times — bind it in a CTE
    first (the oracle queries do)."""
    for sh, m in _STAGES:
        expr = f"((({expr}) | (({expr}) << {sh})) & {m})"
    return expr


def sql_morton(cx_expr: str, cy_expr: str) -> str:
    return f"({sql_spread(cx_expr)} | ({sql_spread(cy_expr)} << 1))"
