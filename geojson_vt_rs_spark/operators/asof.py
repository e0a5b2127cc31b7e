"""Distributed as-of join (point-in-time join): match every left row
to the LATEST right row with the same key and ``right.ts <= left.ts``.

The feature-store / trading primitive Spark lacks natively (DuckDB
ships it as ``ASOF JOIN``, which is exactly what the oracle uses).
Implemented as a composition of existing DataFrame ops — no Python in
the path:

* tag both sides, UNION, and take ``last(right_payload, ignorenulls)``
  over a window PARTITIONED BY key ORDERED BY (ts, side) ROWS
  UNBOUNDED PRECEDING..CURRENT — the classic union-scan formulation.
  Right rows sort BEFORE left rows at equal ts (side 0 < 1), giving
  the inclusive ``>=`` semantics of DuckDB's default ASOF.
* ONE shuffle total (the window's hash partitioning on the key);
  within-partition sort is spill-able.  Per-key skew is the inherent
  cost of any as-of semantics; keys here are user-grained.
* ties on (key, ts) WITHIN the right side are resolved before the
  union: keep the max-id row per (key, ts) via a struct-max partial
  agg (``max_by`` in the oracle), so both engines see the same
  well-defined right relation — DuckDB's ASOF is otherwise free to
  pick either tied row.
* timestamps never enter arithmetic except as exact integer
  microseconds (``unix_micros`` == ``epoch_us``), so the lag column
  is BIGINT-exact cross-engine; matched payload columns pass through
  untouched.

No reference counterpart (maxammann/geojson-vt-rs is a vector-tile
engine); this is a training-pipeline/analytics extension (event
attribution: each purchase joined to the user's latest prior
non-purchase touchpoint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _micros(colname: str, dtype) -> "F.Column":
    """Exact integer microseconds since the epoch for BOTH timestamp
    flavors: parquet columns load as TIMESTAMP_NTZ (where unix_micros
    is a type error — it wants TIMESTAMP) and DuckDB's naive TIMESTAMP
    ``epoch_us`` treats the wall-clock value as UTC, so the NTZ branch
    diffs against an NTZ epoch literal (same integer, no session-tz
    dependence)."""
    if isinstance(dtype, T.TimestampNTZType):
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', {colname})"
        )
    return F.unix_micros(F.col(colname))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_id: str,
    right_payload: str,
) -> DataFrame:
    """Backward-inclusive as-of join.

    Returns every ``left`` row plus (``matched_<right_id>``,
    ``matched_<right_payload>``, ``lag_us``) from the latest right row
    with the same ``key`` and ``right.ts <= left.ts`` (NULLs when no
    such row).  Right-side (key, ts) ties collapse to the max-id row
    first, so the match is total-order deterministic."""
    r = (
        right.groupBy(key, ts)
        .agg(F.max(F.struct(right_id, right_payload)).alias("_rp"))
        .select(
            F.col(key),
            F.col(ts),
            F.lit(0).alias("_side"),
            F.struct(
                F.col(f"_rp.{right_id}").alias("rid"),
                F.col(f"_rp.{right_payload}").alias("rpay"),
                _micros(ts, right.schema[ts].dataType).alias("rts"),
            ).alias("_r"),
        )
    )
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_r"].dataType).alias("_r"),
    )
    unioned = l_tagged.select(
        *lcols, "_side", "_r"
    ).unionByName(
        r.select(
            *[
                F.col(c) if c in (key, ts) else F.lit(None).cast(
                    dict(zip(left.columns, [f.dataType for f in left.schema]))[
                        c
                    ]
                ).alias(c)
                for c in lcols
            ],
            "_side",
            "_r",
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        unioned.withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select(
        *lcols,
        F.col("_m.rid").alias(f"matched_{right_id}"),
        F.col("_m.rpay").alias(f"matched_{right_payload}"),
        (_micros(ts, left.schema[ts].dataType) - F.col("_m.rts")).alias(
            "lag_us"
        ),
    )


def purchase_attribution(events: DataFrame) -> DataFrame:
    """Driver-query shape: each 'purchase' event joined as-of to the
    same user's latest prior (or simultaneous) NON-purchase event.
    Output: (event_id, user_id, matched_event_id, matched_value,
    lag_us), ordered deterministically by the driver's sort."""
    left = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = events.filter(F.col("event_type") != "purchase")
    out = asof_join(
        left, right, key="user_id", ts="ts",
        right_id="event_id", right_payload="value",
    )
    return out.select(
        "event_id", "user_id", "matched_event_id", "matched_value", "lag_us"
    )


def duck_purchase_attribution_sql(table: str = "events") -> str:
    """DuckDB twin using the NATIVE ASOF LEFT JOIN — a genuinely
    independent implementation of the same semantics (the engine side
    never materializes per-left candidate sets).  Right-side (key, ts)
    ties pre-collapse to the max-id row (max_by), mirroring the
    engine's struct-max."""
    return (
        f"WITH l AS (SELECT event_id, user_id, ts FROM {table} "
        "WHERE event_type = 'purchase'), "
        "r AS (SELECT user_id, ts, max(event_id) AS r_eid, "
        f"max_by(value, event_id) AS r_val FROM {table} "
        "WHERE event_type <> 'purchase' GROUP BY user_id, ts) "
        "SELECT l.event_id, l.user_id, r.r_eid AS matched_event_id, "
        "r.r_val AS matched_value, "
        "epoch_us(l.ts) - epoch_us(r.ts) AS lag_us "
        "FROM l ASOF LEFT JOIN r "
        "ON l.user_id = r.user_id AND l.ts >= r.ts"
    )
