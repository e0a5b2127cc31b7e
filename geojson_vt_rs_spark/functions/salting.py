"""Salted two-phase aggregation for skewed keys (dense metro cells).

north_star: "salted repartitioning and AQE handle hot-tile skew".  AQE's
skew-join splitting covers joins; for AGGREGATIONS over a hot key the
classic fix is salting: shuffle on (key, salt) first so no single reducer
owns a metro cell, then combine the partials.  Works for any algebraic
aggregate; helpers below cover counts/sums.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(
    df: DataFrame, keys: Sequence[str], n_salts: int = 16, out: str = "n"
) -> DataFrame:
    """COUNT(*) grouped by ``keys`` with bounded per-reducer fan-in."""
    # deterministic salt: hash of a monotonically increasing id spreads
    # rows of the same hot key uniformly without data-dependent state
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.count(F.lit(1)).alias("_pc"))
    return partial.groupBy(*keys).agg(F.sum("_pc").alias(out))


def salted_sum(
    df: DataFrame, keys: Sequence[str], value: str, n_salts: int = 16,
    out: str = "total",
) -> DataFrame:
    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    partial = salted.groupBy(*keys, "_salt").agg(F.sum(value).alias("_ps"))
    return partial.groupBy(*keys).agg(F.sum("_ps").alias(out))
