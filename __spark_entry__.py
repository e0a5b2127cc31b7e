"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship query on /root/testdata/sf0.001.
queries()      -> operator queries from SURVEY.md §2 (+ graft ops), each
                  (spark, sf_dir) -> DataFrame.
oracle_sql()   -> DuckDB twins over the same parquet views; byte-identical
                  math so row-count + schema + value-hash all match.

Every aggregate/computed column is aliased identically on both sides.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from geojson_vt_rs_spark.functions.geo_synth import (
    sql_synth_lat,
    sql_synth_lon,
    synth_lat,
    synth_lon,
)
from geojson_vt_rs_spark.functions.mercator import (
    cell_id,
    cell_xy,
    mercator_x,
    mercator_y,
    sql_cell_id,
    sql_cell_xy,
    sql_mercator_x,
    sql_mercator_y,
)

US_STATES = "/root/reference/fixtures/us-states.json"


def _orders_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return df.select(
        F.col("o_orderkey").alias("key"),
        synth_lon(F.col("o_orderkey")).alias("lon"),
        synth_lat(F.col("o_orderkey")).alias("lat"),
    )


_SQL_POINTS = (
    "SELECT o_orderkey AS key, "
    f"{sql_synth_lon('o_orderkey')} AS lon, "
    f"{sql_synth_lat('o_orderkey')} AS lat FROM orders"
)


# --------------------------------------------------------------------- P1/P10
def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched cell-encode: project to unit mercator, assign z7 quad cells
    (to_id scheme, lib.rs:64-66), count per cell.  Pure column exprs —
    whole-stage codegen, no Python."""
    pts = _orders_points(spark, sf_dir)
    mx = mercator_x(F.col("lon"))
    my = mercator_y(F.col("lat"))
    cx, cy = cell_xy(mx, my, 7)
    return (
        pts.select(cell_id(7, cx, cy).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def _sql_cells(z: int) -> str:
    mx = sql_mercator_x("lon")
    my = sql_mercator_y("lat")
    cx, cy = sql_cell_xy(mx, my, z)
    return sql_cell_id(z, cx, cy)


SQL_CELL_ASSIGN = (
    f"SELECT {_sql_cells(7)} AS cell, count(*) AS n_points "
    f"FROM ({_SQL_POINTS}) GROUP BY 1"
)


# ------------------------------------------------------------------------ A1
def q_tile_stats_per_zoom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats: occupied tiles per zoom (lib.rs:284-292,436-438 analog)."""
    pts = _orders_points(spark, sf_dir)
    mx = mercator_x(F.col("lon"))
    my = mercator_y(F.col("lat"))
    out = None
    for z in (3, 5, 7):
        cx, cy = cell_xy(mx, my, z)
        d = pts.select(F.lit(z).alias("zoom"), cell_id(z, cx, cy).alias("cell"))
        out = d if out is None else out.unionByName(d)
    return out.groupBy("zoom").agg(
        F.countDistinct("cell").alias("n_tiles"),
        F.count(F.lit(1)).alias("n_points"),
    )


SQL_TILE_STATS = (
    "SELECT zoom, count(DISTINCT cell) AS n_tiles, count(*) AS n_points FROM ("
    + " UNION ALL ".join(
        f"SELECT {z} AS zoom, {_sql_cells(z)} AS cell FROM ({_SQL_POINTS})"
        for z in (3, 5, 7)
    )
    + ") GROUP BY zoom"
)


# ------------------------------------------------------------------------ T2
def q_split_stop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """index_max_points stop condition (lib.rs:305-313): classify z5 cells
    as split vs leaf at threshold 200."""
    pts = _orders_points(spark, sf_dir)
    mx = mercator_x(F.col("lon"))
    my = mercator_y(F.col("lat"))
    cx, cy = cell_xy(mx, my, 5)
    per_cell = (
        pts.select(cell_id(5, cx, cy).alias("cell"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("np"))
    )
    return per_cell.select(
        F.when(F.col("np") > 200, F.lit("split")).otherwise(F.lit("leaf")).alias(
            "action"
        )
    ).groupBy("action").agg(
        F.count(F.lit(1)).alias("n_cells")
    )


SQL_SPLIT_STOP = (
    "SELECT CASE WHEN np > 200 THEN 'split' ELSE 'leaf' END AS action, "
    "count(*) AS n_cells FROM ("
    f"SELECT {_sql_cells(5)} AS cell, count(*) AS np FROM ({_SQL_POINTS}) "
    "GROUP BY 1) GROUP BY 1"
)


# --------------------------------------------------------------------- F2/F3
def q_bbox_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trivial accept/reject band classification (clip.rs:373-398) over
    point bboxes for the x band [0.3, 0.6)."""
    pts = _orders_points(spark, sf_dir)
    mx = mercator_x(F.col("lon")).alias("mx")
    d = pts.select(mx)
    cls = (
        F.when((F.col("mx") >= 0.3) & (F.col("mx") < 0.6), F.lit("accept"))
        .when((F.col("mx") < 0.3) | (F.col("mx") >= 0.6), F.lit("reject"))
        .otherwise(F.lit("clip"))
    )
    return d.select(cls.alias("band_class")).groupBy("band_class").agg(
        F.count(F.lit(1)).alias("n")
    )


SQL_BBOX_PRUNE = (
    "SELECT CASE WHEN mx >= 0.3 AND mx < 0.6 THEN 'accept' "
    "WHEN mx < 0.3 OR mx >= 0.6 THEN 'reject' ELSE 'clip' END AS band_class, "
    "count(*) AS n FROM ("
    f"SELECT {sql_mercator_x('lon')} AS mx FROM ({_SQL_POINTS})) GROUP BY 1"
)


# ------------------------------------------------------------------------ C5
def q_wrap_copies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Antimeridian world-copy membership (wrap.rs:19-43): how many points
    fall in the left/center/right buffered bands (buffer = 64/4096)."""
    b = 64.0 / 4096.0
    pts = _orders_points(spark, sf_dir)
    mx = mercator_x(F.col("lon"))
    d = pts.select(mx.alias("mx"))
    return d.agg(
        F.sum(((F.col("mx") >= -1.0 - b) & (F.col("mx") <= b)).cast("long")).alias(
            "left_copy"
        ),
        F.sum(((F.col("mx") >= -b) & (F.col("mx") <= 1.0 + b)).cast("long")).alias(
            "center_copy"
        ),
        F.sum(((F.col("mx") >= 1.0 - b) & (F.col("mx") <= 2.0 + b)).cast("long")).alias(
            "right_copy"
        ),
    )


SQL_WRAP_COPIES = (
    "SELECT "
    "sum(CASE WHEN mx >= -1.015625 AND mx <= 0.015625 THEN 1 ELSE 0 END) AS left_copy, "
    "sum(CASE WHEN mx >= -0.015625 AND mx <= 1.015625 THEN 1 ELSE 0 END) AS center_copy, "
    "sum(CASE WHEN mx >= 0.984375 AND mx <= 2.015625 THEN 1 ELSE 0 END) AS right_copy "
    f"FROM (SELECT {sql_mercator_x('lon')} AS mx FROM ({_SQL_POINTS}))"
)


# --------------------------------------------------------- graft: PIP join
def _nation_rects_sql() -> str:
    # one deterministic rect per nation, derived from n_nationkey
    return (
        "SELECT n_nationkey AS rect_id, "
        "(CAST(n_nationkey * 13 % 300 AS DOUBLE) - 150.0) AS rx0, "
        "(CAST(n_nationkey * 7 % 140 AS DOUBLE) - 70.0) AS ry0, "
        "(CAST(n_nationkey * 13 % 300 AS DOUBLE) - 150.0 + 12.0) AS rx1, "
        "(CAST(n_nationkey * 7 % 140 AS DOUBLE) - 70.0 + 9.0) AS ry1 "
        "FROM nation"
    )


def _nation_rects(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    k = F.col("n_nationkey").cast("long")
    rx0 = (k * 13 % 300).cast("double") - 150.0
    ry0 = (k * 7 % 140).cast("double") - 70.0
    return n.select(
        F.col("n_nationkey").alias("rect_id"),
        rx0.alias("rx0"),
        ry0.alias("ry0"),
        (rx0 + 12.0).alias("rx1"),
        (ry0 + 9.0).alias("ry1"),
    )


def q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon spatial join, broadcast small side: image-like
    points vs per-nation rectangular footprints (the SQL-checkable shape
    of the tile-polygon PIP; ray-cast refinement is pytest-verified in
    tests/test_spatial.py against brute force)."""
    pts = _orders_points(spark, sf_dir)
    rects = _nation_rects(spark, sf_dir)
    j = pts.join(
        F.broadcast(rects),
        (F.col("lon") >= F.col("rx0"))
        & (F.col("lon") < F.col("rx1"))
        & (F.col("lat") >= F.col("ry0"))
        & (F.col("lat") < F.col("ry1")),
        "inner",
    )
    return j.groupBy("rect_id").agg(F.count(F.lit(1)).alias("n_inside"))


SQL_PIP_JOIN = (
    "SELECT rect_id, count(*) AS n_inside "
    f"FROM ({_SQL_POINTS}) p JOIN ({_nation_rects_sql()}) r "
    "ON p.lon >= r.rx0 AND p.lon < r.rx1 AND p.lat >= r.ry0 AND p.lat < r.ry1 "
    "GROUP BY 1"
)


# --------------------------------------------------------- graft: kNN join
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN join (k=3) of customer points to nation rect centers: candidate
    cross join + ranking window, deterministic tie-break on center id."""
    from pyspark.sql import Window

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("key"),
        synth_lon(F.col("c_custkey")).alias("lon"),
        synth_lat(F.col("c_custkey")).alias("lat"),
    )
    rects = _nation_rects(spark, sf_dir).select(
        F.col("rect_id"),
        ((F.col("rx0") + F.col("rx1")) / 2.0).alias("cx"),
        ((F.col("ry0") + F.col("ry1")) / 2.0).alias("cy"),
    )
    j = c.crossJoin(F.broadcast(rects)).withColumn(
        "d2",
        (F.col("lon") - F.col("cx")) * (F.col("lon") - F.col("cx"))
        + (F.col("lat") - F.col("cy")) * (F.col("lat") - F.col("cy")),
    )
    w = Window.partitionBy("key").orderBy(F.col("d2").asc(), F.col("rect_id").asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("key", "rank", "rect_id")
    )


SQL_KNN_JOIN = (
    "SELECT key, rank, rect_id FROM ("
    "SELECT p.key, r.rect_id, "
    "row_number() OVER (PARTITION BY p.key ORDER BY "
    "(p.lon-(r.rx0+r.rx1)/2.0)*(p.lon-(r.rx0+r.rx1)/2.0) + "
    "(p.lat-(r.ry0+r.ry1)/2.0)*(p.lat-(r.ry0+r.ry1)/2.0) ASC, r.rect_id ASC) AS rank "
    "FROM (SELECT c_custkey AS key, "
    f"{sql_synth_lon('c_custkey')} AS lon, {sql_synth_lat('c_custkey')} AS lat "
    f"FROM customer) p CROSS JOIN ({_nation_rects_sql()}) r"
    ") WHERE rank <= 3"
)


# ------------------------------------------------------------ dedup: exact
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash over documents: md5 group -> group
    sizes -> distribution (hash-groupBy, map-side partial agg)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.select(F.md5(F.col("text")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("copies"))
        .groupBy("copies")
        .agg(F.count(F.lit(1)).alias("n_groups"))
    )


SQL_DEDUP_EXACT = (
    "SELECT copies, count(*) AS n_groups FROM ("
    "SELECT md5(text) AS h, count(*) AS copies FROM documents GROUP BY 1"
    ") GROUP BY 1"
)


# ----------------------------------------------------------- text: tokens
def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + length stats per source."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return d.groupBy("source").agg(
        F.sum(toks.cast("long")).alias("total_tokens"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )


SQL_TOKEN_STATS = (
    "SELECT source, "
    "sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS total_tokens, "
    "sum(length(text)) AS total_chars, count(*) AS n_docs "
    "FROM documents GROUP BY 1"
)


# ----------------------------------------------------------------- contract
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batched quad-cell assignment + per-cell counts at sf0.001."""
    return q_cell_assign(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cell_assign": q_cell_assign,
        "tile_stats_per_zoom": q_tile_stats_per_zoom,
        "split_stop": q_split_stop,
        "bbox_prune": q_bbox_prune,
        "wrap_copies": q_wrap_copies,
        "pip_join": q_pip_join,
        "knn_join": q_knn_join,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cell_assign": SQL_CELL_ASSIGN,
        "tile_stats_per_zoom": SQL_TILE_STATS,
        "split_stop": SQL_SPLIT_STOP,
        "bbox_prune": SQL_BBOX_PRUNE,
        "wrap_copies": SQL_WRAP_COPIES,
        "pip_join": SQL_PIP_JOIN,
        "knn_join": SQL_KNN_JOIN,
        "dedup_exact": SQL_DEDUP_EXACT,
        "token_stats": SQL_TOKEN_STATS,
    }
