"""Web-Mercator + hierarchical quad-cell expressions.

The cell scheme IS the reference's tile key: to_id(z,x,y) =
((1<<z)*y + x)*32 + z (/root/reference/src/lib.rs:64-66), applied to the
unit-square projection of convert.rs:22-29.  These are plain Column
expressions — Catalyst folds/pushes them, whole-stage codegen runs them;
the DuckDB-oracle SQL twins below are textually the same math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mercator_x(lon: Column) -> Column:
    """x = lon/360 + 0.5 (convert.rs:24)."""
    return lon / F.lit(360.0) + F.lit(0.5)


def mercator_y(lat: Column) -> Column:
    """y = clamp(0.5 - 0.25*ln((1+sin)/(1-sin))/pi, 0, 1) (convert.rs:23-27)."""
    sine = F.sin(lat * F.lit(3.141592653589793) / F.lit(180.0))
    y = F.lit(0.5) - F.lit(0.25) * F.log(
        (F.lit(1.0) + sine) / (F.lit(1.0) - sine)
    ) / F.lit(3.141592653589793)
    return F.greatest(F.least(y, F.lit(1.0)), F.lit(0.0))


def cell_xy(mx: Column, my: Column, z: int) -> tuple:
    """Integer cell coords at zoom z; clamped into [0, 2^z-1]."""
    z2 = float(1 << z)
    cx = F.least(
        F.greatest(F.floor(mx * F.lit(z2)), F.lit(0)), F.lit((1 << z) - 1)
    ).cast("long")
    cy = F.least(
        F.greatest(F.floor(my * F.lit(z2)), F.lit(0)), F.lit((1 << z) - 1)
    ).cast("long")
    return cx, cy


def cell_id(z: int, cx: Column, cy: Column) -> Column:
    """to_id(z,x,y) = ((1<<z)*y + x)*32 + z (lib.rs:64-66)."""
    z2 = 1 << z
    return (F.lit(z2).cast("long") * cy + cx) * F.lit(32).cast("long") + F.lit(z)


# ----- SQL twins (DuckDB) ------------------------------------------------


def sql_mercator_x(lon_expr: str) -> str:
    return f"(({lon_expr}) / 360.0 + 0.5)"


def sql_mercator_y(lat_expr: str) -> str:
    s = f"sin(({lat_expr}) * pi() / 180.0)"
    y = f"(0.5 - 0.25 * ln((1.0 + {s}) / (1.0 - {s})) / pi())"
    return f"greatest(least({y}, 1.0), 0.0)"


def sql_cell_xy(mx_expr: str, my_expr: str, z: int) -> tuple:
    z2 = float(1 << z)
    hi = (1 << z) - 1
    cx = f"CAST(least(greatest(floor(({mx_expr}) * {z2}), 0), {hi}) AS BIGINT)"
    cy = f"CAST(least(greatest(floor(({my_expr}) * {z2}), 0), {hi}) AS BIGINT)"
    return cx, cy


def sql_cell_id(z: int, cx_expr: str, cy_expr: str) -> str:
    z2 = 1 << z
    return f"(({z2} * ({cy_expr}) + ({cx_expr})) * 32 + {z})"
