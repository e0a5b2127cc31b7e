"""Bucketed interval (range) join: match every point ``us`` to every
interval ``[lo_us, hi_us)`` that contains it — WITHOUT the
BroadcastNestedLoopJoin Spark lowers a bare inequality join to.

The blocking trick: intervals explode to the fixed-width time buckets
they overlap (``sequence(lo DIV W, hi DIV W)``), points hash to their
single bucket (``us DIV W``), and the join becomes a plain equi-join
on the bucket followed by the exact range filter.  Each (interval,
point) pair meets in EXACTLY one bucket — the point's — so the
blocking is complete and duplicate-free by construction (no distinct
needed).  Shuffle volume is |points| + |intervals| * ceil(len/W)
rows; pick ``bucket_us`` near the median interval length so the
per-interval fan-out stays O(1).

Catalyst notes (CLAUDE.md rules): the generator is ``explode_outer``
+ ``isNotNull`` — a plain ``explode`` over the computed sequence
makes Catalyst infer ``size(seq) > 0`` and push the whole generator
expression below the exchange as a scan-side filter (the winnow
regression).  ``DIV`` on non-negative BIGINT is exact floor division
in both engines.

At 100 TB this is the standard "events x campaign windows" shape:
the bucket key is high-cardinality (time-uniform), so AQE handles the
join strategy (broadcast when the exploded interval side is small,
shuffled-hash otherwise) — no hint is forced.

No reference counterpart; training-pipeline/analytics extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BUCKET_US = 7 * 86400 * 1_000_000  # one week


def range_join_points(
    intervals: DataFrame,
    points: DataFrame,
    bucket_us: int = DEFAULT_BUCKET_US,
) -> DataFrame:
    """Inner range join.

    ``intervals``: (interval_id, lo_us, hi_us) with lo_us <= hi_us,
    half-open [lo_us, hi_us).  ``points``: (pid, us, *payload).
    Returns points x containing intervals (one row per match) with
    all columns from both sides.
    """
    iv = intervals.select(
        "interval_id",
        "lo_us",
        "hi_us",
        F.explode_outer(
            F.sequence(
                F.expr(f"lo_us DIV {bucket_us}"),
                F.expr(f"hi_us DIV {bucket_us}"),
            )
        ).alias("_bucket"),
    ).filter(F.col("_bucket").isNotNull())
    p = points.withColumn("_bucket", F.expr(f"us DIV {bucket_us}"))
    return (
        p.join(iv, "_bucket")
        .filter((F.col("us") >= F.col("lo_us")) & (F.col("us") < F.col("hi_us")))
        .drop("_bucket")
    )


def campaign_order_stats(orders: DataFrame, every: int = 50) -> DataFrame:
    """Driver-query shape: every ``every``-th order opens a campaign
    window [o_orderdate, o_orderdate + (o_orderkey % 28 + 1) days);
    count the orders placed inside each window and sum their totals in
    fixed-point cents (order-free integer sums — cross-engine exact).

    Output: (interval_id, n_points, sum_cents).
    """
    from .asof import _micros

    us = _micros("o_orderdate", orders.schema["o_orderdate"].dataType)
    day_us = 86400 * 1_000_000
    iv = orders.filter(F.col("o_orderkey") % every == 0).select(
        F.col("o_orderkey").alias("interval_id"),
        us.alias("lo_us"),
        (
            us
            + (F.col("o_orderkey") % 28 + 1) * F.lit(day_us)
        ).alias("hi_us"),
    )
    pts = orders.select(
        F.col("o_orderkey").alias("pid"),
        us.alias("us"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    matched = range_join_points(iv, pts)
    return matched.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("cents").alias("sum_cents"),
    )


def duck_campaign_order_stats_sql(
    table: str = "orders", every: int = 50
) -> str:
    """DuckDB twin: the DIRECT inequality join (DuckDB plans a native
    range join) — a genuinely independent formulation; no bucketing on
    the oracle side."""
    return (
        f"WITH iv AS (SELECT o_orderkey AS interval_id, "
        f"epoch_us(o_orderdate) AS lo_us, "
        f"epoch_us(o_orderdate) + (o_orderkey % 28 + 1) * 86400000000 "
        f"AS hi_us FROM {table} WHERE o_orderkey % {every} = 0), "
        f"p AS (SELECT epoch_us(o_orderdate) AS us, "
        f"CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents "
        f"FROM {table}) "
        f"SELECT interval_id, CAST(count(*) AS BIGINT) AS n_points, "
        f"CAST(sum(cents) AS BIGINT) AS sum_cents "
        f"FROM iv JOIN p ON p.us >= iv.lo_us AND p.us < iv.hi_us "
        f"GROUP BY interval_id"
    )
