"""Gap-based sessionization: assign every event to a session that
closes when the same key goes quiet for more than ``gap_us``, then
roll sessions up (count / span / value sum).

The classic clickstream primitive (and the batch twin of Structured
Streaming's session windows).  Implemented as a composition of
existing DataFrame ops — no Python in the path:

* ONE shuffle total: ``lag`` and the running ``sum`` of new-session
  flags share the same window spec (PARTITION BY key ORDER BY
  (us, id)), and the final ``groupBy(key, session_seq)`` is satisfied
  by the existing hash partitioning on ``key`` (ClusteredDistribution
  subset rule) — no second exchange.
* the order key is (us, id), a total order, so ``session_seq`` is
  deterministic under ties; a gap EXACTLY equal to ``gap_us``
  continues the session (strict ``>`` starts a new one) — the
  boundary both engines share.
* timestamps enter arithmetic only as exact integer microseconds
  (``_micros`` == DuckDB ``epoch_us``); float values fold only after
  fixed-point conversion ``CAST(floor(v*100 + 0.5) AS BIGINT)`` so
  every aggregate is an order-free integer sum (cross-engine
  byte-identical — see CLAUDE.md oracle conventions).

At 100 TB: per-key skew is the inherent cost of any sessionization;
keys here are user-grained, partitions sort-spill.  State never
leaves the window operator (no per-session collect).

No reference counterpart (maxammann/geojson-vt-rs is a vector-tile
engine); this is a training-pipeline/analytics extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .asof import _micros

DEFAULT_GAP_US = 8 * 3600 * 1_000_000  # 8 hours


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    value_col: str,
    gap_us: int = DEFAULT_GAP_US,
) -> DataFrame:
    """Per-``key`` gap sessionization + session rollup.

    Returns one row per session: (key, session_seq, n_events,
    start_us, end_us, duration_us, sum_value_cents).  ``session_seq``
    is 1-based in (us, id) order within the key.

    NULL timestamps order LAST explicitly (Spark's default is NULLS
    FIRST, DuckDB's is NULLS LAST — the frozen oracle's order): null-ts
    rows join the key's final session (their gap test is NULL -> the
    CASE's ELSE 0 on both engines), asserted in
    tests/test_sessions_rangejoin.py.
    """
    us = _micros(ts, events.schema[ts].dataType)
    e = events.select(
        F.col(key),
        F.col(id_col).alias("_id"),
        us.alias("_us"),
        F.col(value_col).alias("_v"),
    )
    w = Window.partitionBy(key).orderBy(
        F.col("_us").asc_nulls_last(), F.col("_id").asc()
    )
    prev = F.lag("_us").over(w)
    flagged = e.withColumn(
        "_new",
        F.when(prev.isNull() | (F.col("_us") - prev > F.lit(gap_us)), 1)
        .otherwise(0),
    )
    seq = F.sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = flagged.withColumn("session_seq", seq)
    cents = F.floor(F.col("_v") * 100 + F.lit(0.5)).cast("bigint")
    return sessions.groupBy(key, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("_us").alias("start_us"),
        F.max("_us").alias("end_us"),
        (F.max("_us") - F.min("_us")).alias("duration_us"),
        F.sum(cents).alias("sum_value_cents"),
    )


def duck_sessionize_sql(
    table: str,
    key: str,
    ts: str,
    id_col: str,
    value_col: str,
    gap_us: int = DEFAULT_GAP_US,
) -> str:
    """DuckDB twin: identical window formulation; every accumulating
    column is integer (epoch_us / fixed-point cents) so the rollup is
    order-free, and DuckDB's HUGEINT sums cast back to BIGINT."""
    return (
        f"WITH e AS (SELECT {key}, {id_col} AS _id, epoch_us({ts}) AS _us, "
        f"CAST(floor({value_col} * 100 + 0.5) AS BIGINT) AS _cents "
        f"FROM {table}), "
        f"l AS (SELECT *, lag(_us) OVER "
        f"(PARTITION BY {key} ORDER BY _us, _id) AS _prev FROM e), "
        f"s AS (SELECT *, sum(CASE WHEN _prev IS NULL OR _us - _prev > "
        f"{gap_us} THEN 1 ELSE 0 END) OVER (PARTITION BY {key} "
        f"ORDER BY _us, _id ROWS BETWEEN UNBOUNDED PRECEDING AND "
        f"CURRENT ROW) AS session_seq FROM l) "
        f"SELECT {key}, CAST(session_seq AS BIGINT) AS session_seq, "
        f"CAST(count(*) AS BIGINT) AS n_events, "
        f"min(_us) AS start_us, max(_us) AS end_us, "
        f"max(_us) - min(_us) AS duration_us, "
        f"CAST(sum(_cents) AS BIGINT) AS sum_value_cents "
        f"FROM s GROUP BY {key}, session_seq"
    )
