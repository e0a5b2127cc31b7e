"""Per-key rolling event-time aggregates (e.g. "each user's activity
over the trailing 24h at every event") via a RANGE-framed window —
the feature-engineering primitive behind rate limits, abuse signals,
and engagement features.

One shuffle: the window is PARTITIONED by the key and ordered by
exact integer microseconds, so the RANGE frame
``[us - window + 1, us]`` is tie-stable by construction (same-``us``
peers always share one frame — no hidden dependence on shuffle
order).  Sums fold fixed-point cents (order-free integers), so the
DuckDB twin matches byte-for-byte.  Per-key skew is the inherent cost
of per-key rolling semantics; frames sort-spill within partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .asof import _micros

DEFAULT_WINDOW_US = 24 * 3600 * 1_000_000  # trailing 24 hours


def rolling_stats(
    events: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    value_col: str,
    window_us: int = DEFAULT_WINDOW_US,
) -> DataFrame:
    """Per-event trailing-window stats: (id, key, us, win_events,
    win_value_cents) where the window is the inclusive event-time
    range ``[us - window_us + 1, us]`` within the key.

    CONTRACT: ``ts`` must be non-null — a RANGE frame over a NULL
    ordering value has engine-specific placement (Spark NULLS FIRST vs
    DuckDB NULLS LAST), so null-ts rows would break oracle parity
    silently (ADVICE r5; sessionize pins NULLS LAST explicitly, but a
    RANGE frame's null group has no meaningful trailing window at all)."""
    us = _micros(ts, events.schema[ts].dataType)
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("bigint")
    e = events.select(
        F.col(id_col).alias("event_id"),
        F.col(key),
        us.alias("us"),
        cents.alias("_cents"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("us")
        .rangeBetween(-(int(window_us) - 1), 0)
    )
    return e.select(
        "event_id",
        key,
        "us",
        F.count(F.lit(1)).over(w).alias("win_events"),
        F.sum("_cents").over(w).alias("win_value_cents"),
    )


def duck_rolling_sql(
    table: str,
    key: str,
    ts: str,
    id_col: str,
    value_col: str,
    window_us: int = DEFAULT_WINDOW_US,
) -> str:
    return (
        f"WITH e AS (SELECT {id_col} AS event_id, {key}, "
        f"epoch_us({ts}) AS us, "
        f"CAST(floor({value_col} * 100 + 0.5) AS BIGINT) AS _cents "
        f"FROM {table}) "
        f"SELECT event_id, {key}, us, "
        f"CAST(count(*) OVER w AS BIGINT) AS win_events, "
        f"CAST(sum(_cents) OVER w AS BIGINT) AS win_value_cents "
        f"FROM e WINDOW w AS (PARTITION BY {key} ORDER BY us "
        f"RANGE BETWEEN {int(window_us) - 1} PRECEDING AND CURRENT ROW)"
    )
