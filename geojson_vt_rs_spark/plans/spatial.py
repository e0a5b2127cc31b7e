"""The graft: spatial join + raster pipeline over the image+caption table.

Pipeline (north_rule): image rows get deterministic geo-footprints
(pure hash of image_id — no external data), are assigned hierarchical
quad cells (the reference's own to_id scheme as the H3/S2-style index),
point-in-polygon tested against clipped tile polygons (broadcast join +
vectorized numpy ray-casting refine), kNN-matched to neighbor tiles
(3x3 cell-neighborhood candidate explode + ranking window — pure column
exprs, no Python), and mosaicked into z/x/y raster tiles.

Scale notes:
  * tile polygons are index-sized -> broadcast; the equi-join on (x, y)
    is the prune, ray-casting refines only co-located pairs.
  * kNN never leaves the JVM: explode(9 cells) + broadcast join + window.
  * mosaic caps each tile at SLOTS images via a row_number window BEFORE
    the grouped render — bounds per-group memory under metro-cell skew
    (AQE skew-join handles the join side; the cap handles the agg side).
"""

from __future__ import annotations

import json
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geojson_vt_rs_spark.functions.geo_synth import METROS
from geojson_vt_rs_spark.functions.mercator import cell_xy, mercator_x, mercator_y
from geojson_vt_rs_spark.sources.images import decode_image
from geojson_vt_rs_spark.sources.png import encode_png

# --------------------------------------------------------------- footprints


def with_footprints(images: DataFrame) -> DataFrame:
    """Deterministic lon/lat per image_id (FIXTURES.md §3): spread by
    hash, with ~30% collapsing into 3 dense metro cells (skew driver)."""
    h = F.xxhash64(F.col("image_id"))
    h2 = F.xxhash64(F.col("image_id"), F.lit("lat"))
    spread_lon = F.pmod(h, F.lit(360000)).cast("double") / 1000.0 - 180.0
    spread_lat = F.pmod(h2, F.lit(160000)).cast("double") / 1000.0 - 80.0
    m = F.pmod(h, F.lit(10))
    jlon = F.pmod(h2, F.lit(97)).cast("double") / 10000.0
    jlat = F.pmod(h, F.lit(89)).cast("double") / 10000.0
    lon = (
        F.when(m == 0, F.lit(METROS[0][0]) + jlon)
        .when(m == 1, F.lit(METROS[1][0]) + jlon)
        .when(m == 2, F.lit(METROS[2][0]) + jlon)
        .otherwise(spread_lon)
    )
    lat = (
        F.when(m == 0, F.lit(METROS[0][1]) + jlat)
        .when(m == 1, F.lit(METROS[1][1]) + jlat)
        .when(m == 2, F.lit(METROS[2][1]) + jlat)
        .otherwise(spread_lat)
    )
    return images.withColumn("lon", lon).withColumn("lat", lat)


def with_cells(df: DataFrame, zoom: int) -> DataFrame:
    """Unit-mercator projection + integer cell coords at ``zoom``."""
    mx = mercator_x(F.col("lon"))
    my = mercator_y(F.col("lat"))
    cx, cy = cell_xy(mx, my, zoom)
    return (
        df.withColumn("mx", mx)
        .withColumn("my", my)
        .withColumn("cx", cx)
        .withColumn("cy", cy)
    )


# ----------------------------------------------------------------- PIP join


def build_tile_polygons(spark: SparkSession, geojson_path: str, zoom: int):
    """Build a tile index fully split to ``zoom`` (index_max_points=0
    forces every non-empty tile to split, lib.rs:305-313) and return its
    polygon features as a broadcastable DataFrame."""
    from geojson_vt_rs_spark.config import Options
    from geojson_vt_rs_spark.operators.pipeline import read_geojson_features
    from geojson_vt_rs_spark.plans.pyramid import SparkGeoJSONVT

    feats = read_geojson_features(spark, geojson_path)
    index = SparkGeoJSONVT(
        spark, feats, Options(index_max_zoom=zoom, index_max_points=0)
    )
    return tile_polygons_df(spark, index, zoom), index


def tile_polygons_df(spark: SparkSession, index, zoom: int) -> DataFrame:
    """Tile polygon features at ``zoom`` from a SparkGeoJSONVT index as a
    broadcastable DataFrame (x, y, feature_idx, rings_json, id_str)."""
    rows = []
    for tid, t in index.get_internal_tiles().items():
        if t.z != zoom:
            continue
        for idx, f in enumerate(t.features):
            if f["type"] != 3:
                continue
            geom = f["geometry"]
            # normalize Polygon vs MultiPolygon to a flat ring list
            from geojson_vt_rs_spark.core.geom import GEOM_MULTIPOLYGON

            rings = (
                [r for poly in geom for r in poly]
                if f["kind"] == GEOM_MULTIPOLYGON
                else geom
            )
            rows.append(
                (t.x, t.y, idx, json.dumps(rings), f["id_str"], f["id_num"])
            )
    schema = (
        "x long, y long, feature_idx int, rings_json string, "
        "id_str string, id_num long"
    )
    # LocalRelation: pip_join broadcasts this table, and an RDD-backed
    # build ran a 32-task Python job per use (0.5 s warm on local[32])
    from geojson_vt_rs_spark.operators.schema import local_relation_df

    return local_relation_df(spark, rows, schema)


def ray_cast_inside(px: np.ndarray, py: np.ndarray, rings: list) -> np.ndarray:
    """Vectorized even-odd ray casting: for each point, odd crossing count
    over all rings = inside (holes handled by parity).  Fully vectorized
    (segments x points) — no per-segment Python loop; crossings per point
    are XOR-folded via a parity sum."""
    inside = np.zeros(len(px), dtype=bool)
    for ring in rings:
        r = np.asarray(ring, dtype=np.float64)
        if len(r) < 3:
            continue
        x0 = r[:-1, 0][:, None]
        y0 = r[:-1, 1][:, None]
        x1 = r[1:, 0][:, None]
        y1 = r[1:, 1][:, None]
        # (n_seg, n_pts): segment straddles the point's horizontal ray
        straddle = (y0 > py) != (y1 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (py - y0) / (y1 - y0)
            xcross = x0 + t * (x1 - x0)
        crossings = (straddle & (px < xcross)).sum(axis=0)
        inside ^= (crossings & 1).astype(bool)
    return inside


def pip_join(
    images_pts: DataFrame,
    tile_polys: DataFrame,
    zoom: int,
    extent: int = 4096,
) -> DataFrame:
    """Broadcast equi-join on the cell (prune) + ray-cast refine.

    Points are transformed to tile-local extent coords (tile.rs:351-357
    transform without rounding) so the test against the emitted integer
    polygons happens in the polygons' own space.
    """
    z2 = float(1 << zoom)
    pts = images_pts.select(
        "image_id",
        "caption",
        "cx",
        "cy",
        ((F.col("mx") * z2 - F.col("cx")) * extent).alias("tx"),
        ((F.col("my") * z2 - F.col("cy")) * extent).alias("ty"),
    )
    joined = pts.join(
        F.broadcast(tile_polys),
        (pts.cx == tile_polys.x) & (pts.cy == tile_polys.y),
        "inner",
    ).select("image_id", "caption", "cx", "cy", "tx", "ty", "feature_idx",
             "rings_json", "id_str")

    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("caption", T.StringType()),
            T.StructField("cx", T.LongType()),
            T.StructField("cy", T.LongType()),
            T.StructField("feature_idx", T.IntegerType()),
            T.StructField("id_str", T.StringType()),
        ]
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(columns=[f.name for f in out_schema.fields])
                continue
            keep = np.zeros(len(pdf), dtype=bool)
            px = pdf["tx"].to_numpy()
            py = pdf["ty"].to_numpy()
            for rj, idx in pdf.groupby("rings_json").groups.items():
                rings = cache.setdefault(rj, json.loads(rj))
                ii = np.asarray(idx)
                keep[ii] = ray_cast_inside(px[ii], py[ii], rings)
            sub = pdf.loc[keep, ["image_id", "caption", "cx", "cy",
                                 "feature_idx", "id_str"]]
            yield sub

    return joined.mapInPandas(refine, schema=out_schema)


# ------------------------------------------------------------------ kNN join


def knn_neighbor_tiles(
    images_pts: DataFrame, tiles_centers: DataFrame, zoom: int, k: int = 3
) -> DataFrame:
    """kNN of each image point to tiles in its 3x3 cell neighborhood.

    Entirely JVM-side: explode of the 9 candidate cells (x wraps mod 2^z,
    y clamped), broadcast equi-join on the candidate cell, squared
    distance to tile centers, ranking window with deterministic
    tie-break.  ``tiles_centers``: (x, y) occupied tiles at ``zoom``.
    """
    z2 = 1 << zoom
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    cand = F.array(
        *[
            F.struct(
                F.pmod(F.col("cx") + dx, F.lit(z2)).alias("nx"),
                (F.col("cy") + dy).alias("ny"),
            )
            for dx, dy in offs
        ]
    )
    pts = images_pts.select(
        "image_id", "mx", "my", "cx", "cy", F.explode(cand).alias("n")
    ).select(
        "image_id",
        "mx",
        "my",
        F.col("n.nx").alias("nx"),
        F.col("n.ny").alias("ny"),
    ).filter((F.col("ny") >= 0) & (F.col("ny") < z2))

    # NOTE: do NOT coalesce(1) an RDD-backed centers table here — a
    # coalesced task evaluates every parent slice sequentially, paying
    # one Python-runner init per slice (measured 1.0 s -> 5 s)
    centers = tiles_centers.select(
        F.col("x").alias("nx"),
        F.col("y").alias("ny"),
        ((F.col("x") + 0.5) / float(z2)).alias("tcx"),
        ((F.col("y") + 0.5) / float(z2)).alias("tcy"),
    )
    j = pts.join(F.broadcast(centers), ["nx", "ny"], "inner").withColumn(
        "d2",
        (F.col("mx") - F.col("tcx")) * (F.col("mx") - F.col("tcx"))
        + (F.col("my") - F.col("tcy")) * (F.col("my") - F.col("tcy")),
    )
    w = Window.partitionBy("image_id").orderBy(
        F.col("d2").asc(), F.col("nx").asc(), F.col("ny").asc()
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("image_id", "rank", F.col("nx").alias("x"), F.col("ny").alias("y"), "d2")
    )


# -------------------------------------------------------------------- mosaic

TILE_PX = 256
SLOT_PX = 16
SLOTS = (TILE_PX // SLOT_PX) ** 2

MOSAIC_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("tile_png", T.BinaryType()),
        T.StructField("n_images", T.IntegerType()),
        T.StructField("src_bytes", T.LongType()),
        T.StructField("first_image_id", T.StringType()),
        T.StructField("last_image_id", T.StringType()),
        T.StructField("manifest_json", T.StringType()),
    ]
)


def nn_resample(rgb: np.ndarray, size: int = SLOT_PX) -> np.ndarray:
    """Deterministic nearest-neighbor resample to size x size."""
    h, w = rgb.shape[:2]
    yi = (np.arange(size) * h) // size
    xi = (np.arange(size) * w) // size
    return rgb[yi][:, xi]


# Above this zoom the worst-case survivor set (4^zoom tiles x SLOTS ids,
# ~50 B/row) can exceed a safe broadcast size (z7 ~ 4.2M rows ~ 200 MB;
# z8 ~ 16.7M rows would blow the broadcast ceiling), so the explicit
# broadcast hint is dropped and AQE picks the join strategy from the
# ACTUAL survivor size at runtime (still a broadcast when the occupied
# tile count is small, a shuffled hash join otherwise).
MOSAIC_BROADCAST_MAX_ZOOM = 7


def mosaic_tiles(
    images_pts: DataFrame, zoom: int, decode_early: bool = False,
    broadcast_survivors: bool | None = None,
) -> DataFrame:
    """Render one raster tile per occupied cell: up to SLOTS images per
    tile (deterministic min-by-image_id cap — bounds skewed groups), each
    nearest-neighbor resampled into a 16x16 slot of a 256x256 PNG.

    The manifest carries per-tile lineage (slot -> image_id) + row counts
    so downstream verification (PSNR, caption equality) and checkpoint
    resume can audit every partition.
    """
    # Keep the multi-KB `bytes` column off the RANKING shuffle:
    #   1. exact top-SLOTS per tile on a BYTES-FREE projection (cx, cy,
    #      image_id — ~40 B/row): ONE window whose `row_number <= k`
    #      filter compiles to a PARTIAL WindowGroupLimit below the
    #      exchange (SPARK-37099) — every map partition ships at most
    #      SLOTS rows per tile, so a dense metro tile is bounded the
    #      same way the former explicit salt phase bounded it, with one
    #      Exchange instead of two.  (The `slot < SLOTS` formulation on
    #      the post-decrement rank does NOT match the group-limit
    #      pattern and lowered to a full per-tile sort — r6 plan diff:
    #      2 Exchange -> 1 in this subplan.)
    #   2. broadcast the survivor ids back onto the cached image rows —
    #      the survivor set is bounded by n_tiles * SLOTS regardless of
    #      input size (mosaic zooms are low, so this stays driver-safe);
    #   3. the surviving image rows cross the wire exactly ONCE, into the
    #      render groupBy (the round-1 plan window-shuffled them twice
    #      more).
    # decode_early=True additionally decodes + nn-resamples map-side so
    # the one wide exchange moves fixed 768-byte slot thumbnails instead
    # of original bytes — the right call when real images are 100KB-10MB;
    # for this synthetic table (~1.5KB/png) the extra Arrow pass costs
    # more than it saves, so it is opt-in.
    ids = images_pts.select("cx", "cy", "image_id")
    w2 = Window.partitionBy("cx", "cy").orderBy(F.col("image_id").asc())
    capped_ids = (
        ids.withColumn("_r", F.row_number().over(w2))
        .filter(F.col("_r") <= SLOTS)
        .select(
            "cx", "cy", "image_id", (F.col("_r") - 1).alias("slot")
        )
    )
    # the survivor set is bounded by occupied_tiles * SLOTS — tiny at low
    # mosaic zooms (hint it broadcast), but worst-case 4^zoom * SLOTS at
    # high zooms; above the threshold let AQE choose from actual sizes
    if broadcast_survivors is None:
        broadcast_survivors = zoom <= MOSAIC_BROADCAST_MAX_ZOOM
    right = F.broadcast(capped_ids) if broadcast_survivors else capped_ids
    joined = images_pts.select(
        "cx", "cy", "image_id", "bytes", "w", "h", "fmt"
    ).join(right, ["cx", "cy", "image_id"], "inner")

    if decode_early:
        slot_schema = T.StructType(
            [
                T.StructField("cx", T.LongType()),
                T.StructField("cy", T.LongType()),
                T.StructField("slot", T.IntegerType()),
                T.StructField("image_id", T.StringType()),
                T.StructField("rgb", T.BinaryType()),
                T.StructField("src_len", T.LongType()),
            ]
        )

        def decode_slots(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rgbs, lens = [], []
                for r in pdf.itertuples(index=False):
                    rgb = decode_image(r.bytes, int(r.w), int(r.h), r.fmt)
                    rgbs.append(nn_resample(rgb).tobytes())
                    lens.append(len(r.bytes))
                yield pd.DataFrame(
                    dict(
                        cx=pdf["cx"].to_numpy(),
                        cy=pdf["cy"].to_numpy(),
                        slot=pdf["slot"].to_numpy(),
                        image_id=pdf["image_id"].to_numpy(),
                        rgb=rgbs if rgbs else np.array([], dtype=object),
                        src_len=lens if lens else np.array([], dtype=np.int64),
                    ),
                    columns=[f.name for f in slot_schema.fields],
                )

        pre = joined.mapInPandas(decode_slots, schema=slot_schema)
    else:
        pre = joined

    def render(key, pdf: pd.DataFrame) -> pd.DataFrame:
        cx, cy = int(key[0]), int(key[1])
        canvas = np.zeros((TILE_PX, TILE_PX, 3), dtype=np.uint8)
        pdf = pdf.sort_values("slot")
        manifest = {}
        src_bytes = 0
        per = TILE_PX // SLOT_PX
        for r in pdf.itertuples(index=False):
            s = int(r.slot)
            ry, rx = (s // per) * SLOT_PX, (s % per) * SLOT_PX
            if decode_early:
                tile_rgb = np.frombuffer(r.rgb, dtype=np.uint8).reshape(
                    SLOT_PX, SLOT_PX, 3
                )
                src_bytes += int(r.src_len)
            else:
                tile_rgb = nn_resample(
                    decode_image(r.bytes, int(r.w), int(r.h), r.fmt)
                )
                src_bytes += len(r.bytes)
            canvas[ry : ry + SLOT_PX, rx : rx + SLOT_PX] = tile_rgb
            manifest[str(s)] = r.image_id
        ids = pdf["image_id"]
        return pd.DataFrame(
            [
                dict(
                    z=zoom,
                    x=cx,
                    y=cy,
                    tile_png=encode_png(canvas),
                    n_images=len(pdf),
                    src_bytes=src_bytes,
                    first_image_id=ids.min(),
                    last_image_id=ids.max(),
                    manifest_json=json.dumps(manifest, sort_keys=True),
                )
            ]
        )

    return pre.groupBy("cx", "cy").applyInPandas(render, schema=MOSAIC_SCHEMA)
