"""Deterministic corpus-curation operators for training-data pipelines:
hash-bucket dataset splits, per-stratum sampling, per-group quota caps.

Every assignment derives from md5 of a seeded key, never from an RNG, so
the same row lands in the same split/sample on every engine, at every
parallelism, and on every re-run — the reproducibility contract a
100-TB training mix needs (adding executors or replaying a failed stage
must not move documents between train and val).  The bucket math is the
repo's standard cross-engine idiom (CLAUDE.md): Spark
``conv(substr(md5(..),1,15),16,10)`` equals DuckDB
``('0x'||substr(md5(..),1,15))::BIGINT`` exactly (15 hex digits < 2^60,
always non-negative, so ``%`` agrees too).

No reference counterpart (maxammann/geojson-vt-rs is a vector-tile
engine); this sits beside text_dedup/ann as the graft's
training-pipeline surface.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 10_000


# ------------------------------------------------------------ hash bucket
def hash_bucket(key: Column, seed: str) -> Column:
    """Deterministic bucket in [0, N_BUCKETS) from md5(seed ':' key)."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % N_BUCKETS
    )


def duck_hash_bucket(key_expr: str, seed: str) -> str:
    """DuckDB twin of :func:`hash_bucket` (byte-identical values)."""
    return (
        f"(('0x' || substr(md5('{seed}:' || CAST({key_expr} AS VARCHAR))"
        f", 1, 15))::BIGINT % {N_BUCKETS})"
    )


# ---------------------------------------------------------- dataset split
def split_thresholds(
    weights: Sequence[tuple[str, float]]
) -> list[tuple[str, int]]:
    """Cumulative integer bucket thresholds; the last split absorbs any
    rounding remainder so every bucket maps to exactly one split."""
    out, cum = [], 0
    for name, w in weights:
        cum += int(round(w * N_BUCKETS))
        out.append((name, cum))
    out[-1] = (out[-1][0], N_BUCKETS)
    return out


def assign_split(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: str = "split-v1",
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.90),
        ("val", 0.05),
        ("test", 0.05),
    ),
) -> DataFrame:
    """Add a deterministic ``split`` column by hash-bucket thresholds.

    Pure JVM column expressions (one md5 per row, no shuffle): the split
    is a row-local function of the key, so it composes with any
    downstream partitioning and survives re-partitioning unchanged.
    """
    b = hash_bucket(F.col(key_col), seed)
    ts = split_thresholds(weights)
    col = F.when(b < ts[0][1], F.lit(ts[0][0]))
    for name, t in ts[1:-1]:
        col = col.when(b < t, F.lit(name))
    col = col.otherwise(F.lit(ts[-1][0]))
    return df.withColumn("split", col)


def duck_split_case(
    key_expr: str,
    seed: str = "split-v1",
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.90),
        ("val", 0.05),
        ("test", 0.05),
    ),
) -> str:
    """DuckDB CASE twin of :func:`assign_split`'s split column."""
    b = duck_hash_bucket(key_expr, seed)
    ts = split_thresholds(weights)
    whens = " ".join(
        f"WHEN {b} < {t} THEN '{name}'" for name, t in ts[:-1]
    )
    if not whens:  # single split: a bare `CASE ELSE` is a parse error
        return f"'{ts[-1][0]}'"
    return f"CASE {whens} ELSE '{ts[-1][0]}' END"


# ----------------------------------------------------- stratified sample
def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    key_col: str = "doc_id",
    seed: str = "mix-v1",
) -> DataFrame:
    """Keep each row iff its hash bucket falls under its stratum's rate.

    The mixture-reweighting primitive (e.g. downsample a dominant
    language): per-stratum keep rates are exact to 1/N_BUCKETS, rows are
    kept/dropped independently of partitioning, and the filter is a pure
    JVM predicate Catalyst can push into the scan.
    """
    b = hash_bucket(F.col(key_col), seed)
    cut = F.lit(int(round(default_rate * N_BUCKETS)))
    for stratum, r in sorted(rates.items()):
        cut = F.when(
            F.col(stratum_col) == stratum, F.lit(int(round(r * N_BUCKETS)))
        ).otherwise(cut)
    return df.filter(b < cut)


def duck_sample_pred(
    stratum_expr: str,
    rates: Mapping[str, float],
    default_rate: float = 1.0,
    key_expr: str = "doc_id",
    seed: str = "mix-v1",
) -> str:
    """DuckDB WHERE twin of :func:`stratified_sample`'s predicate."""
    b = duck_hash_bucket(key_expr, seed)
    whens = " ".join(
        f"WHEN {stratum_expr} = '{s}' THEN {int(round(r * N_BUCKETS))}"
        for s, r in sorted(rates.items())
    )
    default_cut = int(round(default_rate * N_BUCKETS))
    if not whens:  # empty rates: a bare `CASE ELSE` is a parse error
        return f"({b} < {default_cut})"
    cut = f"CASE {whens} ELSE {default_cut} END"
    return f"({b} < {cut})"


# ------------------------------------------------------ budget packing
N_COARSE = 100


def pack_to_budget(
    df: DataFrame,
    group_col: str,
    weight_col: str,
    budget: int,
    key_col: str = "doc_id",
    seed: str = "pack-v1",
) -> DataFrame:
    """Keep rows in deterministic hash order until each group's running
    ``weight_col`` total reaches ``budget`` (inclusive) — the "first N
    tokens per language" primitive of a training-mix builder.

    Exact distributed prefix-sum in two phases so no group ever sorts in
    one task: rows order by (coarse, bucket, key) where coarse =
    bucket / (N_BUCKETS/N_COARSE); phase 1 aggregates per-(group,
    coarse) partial sums (tiny: |groups| x N_COARSE rows) and converts
    them to EXCLUSIVE prefix offsets with a window over that tiny table;
    phase 2 computes the intra-coarse running sum (window partitioned by
    (group, coarse) — each partition holds ~1/N_COARSE of the group) and
    adds the broadcast offset.  The total equals the single-window
    cumulative sum over (group ORDER BY bucket, key) row for row, so the
    oracle twin is a plain ``sum() OVER (... ROWS UNBOUNDED PRECEDING)``.

    ``weight_col`` must be INTEGRAL: the per-(group, coarse) partial
    sums are unordered shuffle reductions, exact (and equal to the
    single-window left fold) only for integer addition — a float weight
    would reorder additions and could flip a row within one ULP of the
    budget across engines/parallelism (CLAUDE.md sequential-fold
    invariant).  Pre-scale floats to fixed-point upstream.
    """
    wtype = df.schema[weight_col].dataType.simpleString()
    if wtype not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"pack_to_budget requires an integral weight_col; got "
            f"{weight_col}: {wtype} — pre-scale to fixed-point"
        )
    b = hash_bucket(F.col(key_col), seed)
    coarse = (b / (N_BUCKETS // N_COARSE)).cast("int")
    rows = df.withColumn("_b", b).withColumn("_c", coarse)
    part = rows.groupBy(group_col, "_c").agg(
        F.sum(F.col(weight_col)).alias("_csum")
    )
    woff = (
        Window.partitionBy(group_col)
        .orderBy("_c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = part.select(
        F.col(group_col).alias("_g"),
        F.col("_c").alias("_c2"),
        F.coalesce(F.sum("_csum").over(woff), F.lit(0)).alias("_off"),
    )
    wrun = (
        Window.partitionBy(group_col, "_c")
        .orderBy("_b", key_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # NULL-SAFE group equality: a plain equi-join on group_col would
    # silently drop every NULL-group row, while both window phases (and
    # the DuckDB twin's PARTITION BY) treat NULL as a real group.
    return (
        rows.join(
            F.broadcast(offsets),
            F.col(group_col).eqNullSafe(F.col("_g"))
            & (F.col("_c") == F.col("_c2")),
        )
        .withColumn(
            "_cum", F.col("_off") + F.sum(F.col(weight_col)).over(wrun)
        )
        .filter(F.col("_cum") <= budget)
        .drop("_b", "_c", "_g", "_c2", "_off", "_cum")
    )


def duck_pack_pred(
    group_expr: str,
    weight_expr: str,
    budget: int,
    key_expr: str = "doc_id",
    seed: str = "pack-v1",
) -> str:
    """DuckDB window expression twin: the inclusive running sum that
    :func:`pack_to_budget` compares against the budget (use inside a
    subquery, filter ``<= budget`` outside)."""
    bucket = duck_hash_bucket(key_expr, seed)
    return (
        f"sum({weight_expr}) OVER (PARTITION BY {group_expr} "
        f"ORDER BY {bucket}, {key_expr} ROWS UNBOUNDED PRECEDING)"
    )


# ----------------------------------------------------------- quota capping
def quota_cap(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Iterable[Column],
    k: int,
    salt_key: str = "doc_id",
    n_salts: int = 16,
) -> DataFrame:
    """EXACT per-group top-k under a deterministic total order, with
    bounded sort width (the per-domain quota cap of a crawl pipeline:
    keep at most ``k`` best documents per source/domain).

    Two-phase salted rank, mirroring the mosaic slot ranking
    (plans/spatial.py): phase 1 ranks inside (group, salt) — a skewed
    group (one domain with billions of pages) sorts in ``n_salts``
    independent lanes, never one task — and keeps ``k`` per lane; phase 2
    ranks the <= k*n_salts survivors per group.  Exactness: any row of
    the true top-k has fewer than k rows ahead of it in the total order,
    hence fewer than k in its own lane, so it always survives phase 1.
    Both windows are PARTITIONED (gen_plans.py's no-unpartitioned-window
    audit holds); the oracle twin is a plain row_number() <= k.

    ``order_cols`` must be a total order (tie-break on a unique key) or
    the result is engine-dependent.
    """
    order = list(order_cols)
    salt = F.pmod(F.xxhash64(F.col(salt_key)), F.lit(n_salts))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order)
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_salt", salt)
        .withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= k)
        .withColumn("_rank", F.row_number().over(w2))
        .filter(F.col("_rank") <= k)
        .drop("_salt", "_r1")
    )
