"""Deterministic synthetic geo-footprints over the TPC-H-ish testdata.

BASELINE.json forbids external data; the oracle tables carry no lon/lat.
So both the Spark queries and their DuckDB oracles derive coordinates as
the SAME pure integer/float function of a key column — including a skewed
"metro" hot-spot (3 dense cells) to exercise salting/AQE, mirroring the
dense-metro-cell skew called out in the north star.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ~30% of keys collapse into 3 metro centers; the rest spread world-wide
METROS = [(-74.006, 40.713), (139.692, 35.690), (2.352, 48.857)]


def synth_lon(key: Column) -> Column:
    spread = ((key * F.lit(2654435761)) % F.lit(360000)).cast("double") / F.lit(
        1000.0
    ) - F.lit(180.0)
    m = key % F.lit(10)
    jitter = (key % F.lit(97)).cast("double") / F.lit(10000.0)
    return (
        F.when(m == 0, F.lit(METROS[0][0]) + jitter)
        .when(m == 1, F.lit(METROS[1][0]) + jitter)
        .when(m == 2, F.lit(METROS[2][0]) + jitter)
        .otherwise(spread)
    )


def synth_lat(key: Column) -> Column:
    spread = ((key * F.lit(7919)) % F.lit(160000)).cast("double") / F.lit(
        1000.0
    ) - F.lit(80.0)
    m = key % F.lit(10)
    jitter = (key % F.lit(89)).cast("double") / F.lit(10000.0)
    return (
        F.when(m == 0, F.lit(METROS[0][1]) + jitter)
        .when(m == 1, F.lit(METROS[1][1]) + jitter)
        .when(m == 2, F.lit(METROS[2][1]) + jitter)
        .otherwise(spread)
    )


def sql_synth_lon(key: str) -> str:
    spread = f"(CAST((({key}) * 2654435761) % 360000 AS DOUBLE) / 1000.0 - 180.0)"
    jitter = f"(CAST(({key}) % 97 AS DOUBLE) / 10000.0)"
    return (
        f"(CASE ({key}) % 10 "
        f"WHEN 0 THEN {METROS[0][0]} + {jitter} "
        f"WHEN 1 THEN {METROS[1][0]} + {jitter} "
        f"WHEN 2 THEN {METROS[2][0]} + {jitter} "
        f"ELSE {spread} END)"
    )


def sql_synth_lat(key: str) -> str:
    spread = f"(CAST((({key}) * 7919) % 160000 AS DOUBLE) / 1000.0 - 80.0)"
    jitter = f"(CAST(({key}) % 89 AS DOUBLE) / 10000.0)"
    return (
        f"(CASE ({key}) % 10 "
        f"WHEN 0 THEN {METROS[0][1]} + {jitter} "
        f"WHEN 1 THEN {METROS[1][1]} + {jitter} "
        f"WHEN 2 THEN {METROS[2][1]} + {jitter} "
        f"ELSE {spread} END)"
    )
