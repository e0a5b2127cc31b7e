"""KMV (k-minimum-values) distinct-count sketch, exactly cross-engine
reproducible (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07).

The workhorse approximate-distinct primitive for 100-TB corpus
accounting (distinct users/URLs/shingles per group) where exact
count-distinct would shuffle every distinct value: hash each value to
a uniform integer, keep the k smallest DISTINCT hashes per group, and
estimate the cardinality from the k-th smallest.  Standard error is
~1/sqrt(k-2) (~6% at k=256) with a bounded, mergeable state of k
values per group — unlike exact distinct, the sketch's shuffle volume
is capped at groups*k rows after the first aggregation.

Exactness contract (what makes this oracle-checkable — unusual for a
"sketch"): the estimator is a DETERMINISTIC function of the input set.

* value hash = ``1 + md5int13(seed:value)`` in ``[1, 2^52]`` (13 hex
  chars = 52 bits keeps ``(k-1) * 2^52`` inside BIGINT for k up to
  ~2000, and the +1 makes the divisor provably nonzero — Spark's
  ``div`` yields NULL on zero where DuckDB's ``//`` raises).
* estimate = ``m`` when the group holds fewer than k distinct hashes
  (the sketch is exact below capacity), else
  ``(k-1) * 2^52 div h_k`` — all-BIGINT, truncating division on
  positive operands (Spark ``div`` == DuckDB ``//``).

Scale shape:

* one partial-agg distinct over (group, h) — the only pass over the
  data; the wide value column never leaves the scan stage (it hashes
  map-side).
* per-group k smallest via the domain-quota salt-lane pattern: a rank
  window PARTITIONED by (group, h % LANES) cuts each lane to k rows
  (spill-able partitioned sort, never a whole group in one task when
  groups are huge), then a second window over the <= LANES*k
  survivors per group.  Correct because a group's k smallest overall
  are each among their own lane's k smallest.
* no global sort, no unpartitioned window, no broadcast assumption.

No reference counterpart (maxammann/geojson-vt-rs is a vector-tile
engine); this sits beside text_dedup/sampling as the graft's
training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 256
KMV_LANES = 16
SEED = "kmv-v1"
_H_BITS = 52
_H_SCALE = 1 << _H_BITS  # 4503599627370496


def _spark_hash(value_expr: str, seed: str = SEED) -> str:
    return (
        f"1L + cast(conv(substring(md5(concat('{seed}:', "
        f"CAST({value_expr} AS STRING))), 1, 13), 16, 10) as bigint)"
    )


def _duck_hash(value_expr: str, seed: str = SEED) -> str:
    return (
        f"(1 + ('0x' || substr(md5('{seed}:' || "
        f"CAST({value_expr} AS VARCHAR)), 1, 13))::BIGINT)"
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = KMV_K,
    lanes: int = KMV_LANES,
) -> DataFrame:
    """Per-group KMV distinct estimate: (group, n_kept, est).

    ``n_kept`` = min(k, true distinct count); ``est`` = the KMV
    estimate (exact when n_kept < k).  Deterministic — byte-identical
    to :func:`duck_kmv_sql` on any partitioning."""
    if not (2 <= k and (k - 1) * _H_SCALE < (1 << 63)):
        raise ValueError(f"k out of BIGINT headroom: {k}")
    v = (
        df.select(
            F.col(group_col).alias("g"),
            F.expr(_spark_hash(value_col)).alias("h"),
        )
        .groupBy("g", "h")
        .agg(F.lit(1))
        .select("g", "h")
    )
    lane_w = Window.partitionBy("g", F.col("h") % lanes).orderBy("h")
    lane = (
        v.withColumn("rn", F.row_number().over(lane_w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    merge_w = Window.partitionBy("g").orderBy("h")
    top = (
        lane.withColumn("rn", F.row_number().over(merge_w))
        .filter(F.col("rn") <= k)
    )
    return (
        top.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max(F.when(F.col("rn") == k, F.col("h"))).alias("_hk"),
        )
        .select(
            F.col("g").alias(group_col),
            "n_kept",
            F.expr(
                f"CASE WHEN n_kept < {k} THEN n_kept "
                f"ELSE ({k} - 1) * {_H_SCALE}L div _hk END"
            ).alias("est"),
        )
    )


def duck_kmv_sql(
    group_col: str,
    value_col: str,
    k: int = KMV_K,
    table: str = "orders",
) -> str:
    """DuckDB twin — single row_number window (the literal formulation;
    the engine's salt-lane split is provably the same k minima)."""
    h = _duck_hash(value_col)
    return (
        f"WITH v AS (SELECT DISTINCT {group_col} AS g, {h} AS h "
        f"FROM {table}), "
        "r AS (SELECT g, h, row_number() OVER "
        "(PARTITION BY g ORDER BY h) AS rn FROM v), "
        f"s AS (SELECT g, CAST(count(*) AS BIGINT) AS n_kept, "
        f"max(CASE WHEN rn = {k} THEN h END) AS hk "
        f"FROM r WHERE rn <= {k} GROUP BY g) "
        f"SELECT g AS {group_col}, n_kept, "
        f"CASE WHEN n_kept < {k} THEN n_kept "
        f"ELSE ({k} - 1) * {_H_SCALE} // hk END AS est FROM s"
    )
