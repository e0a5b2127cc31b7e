"""Exact per-group discrete quantiles (p50/p90/p99-style rollups).

Sketch-free exact quantiles by DEFINITION (the value at 0-based rank
``floor(q * (n-1))`` under a deterministic total order), so the
operator is byte-identical cross-engine — unlike approx_percentile /
quantile_disc, whose interpolation/tie semantics differ between
engines and between versions.

Scale shape: ONE shuffle (hash partition on the group key); rank and
group-size come from two window functions over the SAME partitioning
(Catalyst plans one Exchange + one spill-able sort); the final pivot
is a partial-aggregated CASE-max.  Windows are always PARTITIONED by
the group — never a global sort (the repo's WindowExec rule).  Values
pass through untouched (no arithmetic on the measure), so doubles
hash identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QS = (0.5, 0.9, 0.99)


def _rank_expr(q: float) -> str:
    # identical IEEE double product + floor on both engines: the rank
    # is deterministic cross-engine even when q*(n-1) grazes an integer
    return f"CAST(floor({q!r}D * CAST(n - 1 AS DOUBLE)) AS BIGINT)"


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    qs: tuple = QS,
) -> DataFrame:
    """(group, n, p<q>...) — exact discrete quantiles of ``value_col``
    per group; ties on the value break by ``id_col`` so the selected
    row is unique."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    d = (
        df.select(group_col, value_col, id_col)
        .withColumn("rn", F.row_number().over(w) - F.lit(1))
        .withColumn("n", F.count(F.lit(1)).over(wn))
    )
    aggs = [F.max("n").alias("n")]
    for q in qs:
        aggs.append(
            F.max(
                F.when(
                    F.col("rn") == F.expr(_rank_expr(q)), F.col(value_col)
                )
            ).alias(f"p{int(round(q * 100))}")
        )
    return d.groupBy(group_col).agg(*aggs)


def duck_group_quantiles_sql(
    group_col: str,
    value_col: str,
    id_col: str,
    qs: tuple = QS,
    table: str = "orders",
) -> str:
    """DuckDB twin — the same rank-by-definition formulation (NOT
    quantile_disc, whose tie rules needn't match anyone else's)."""
    ranks = ", ".join(
        f"max(CASE WHEN rn = CAST(floor({q!r} * CAST(n - 1 AS DOUBLE)) "
        f"AS BIGINT) THEN {value_col} END) AS p{int(round(q * 100))}"
        for q in qs
    )
    return (
        f"WITH d AS (SELECT {group_col}, {value_col}, "
        f"row_number() OVER (PARTITION BY {group_col} "
        f"ORDER BY {value_col} ASC, {id_col} ASC) - 1 AS rn, "
        f"CAST(count(*) OVER (PARTITION BY {group_col}) AS BIGINT) AS n "
        f"FROM {table}) "
        f"SELECT {group_col}, CAST(max(n) AS BIGINT) AS n, {ranks} "
        f"FROM d GROUP BY {group_col}"
    )
