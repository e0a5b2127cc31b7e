"""Distributed tile pyramid: the reference's recursive split_tile
(/root/reference/src/lib.rs:251-434) re-expressed as a breadth-first
per-zoom DataFrame loop.

Equivalence argument: the recursion's stop conditions are per-tile, so a
breadth-first traversal visits exactly the same tile set and each tile
sees exactly the same feature multiset (clipping is per-feature and the
clip-band tree is identical).  What the recursion expresses as "retain
source_features on leaves / clear on split parents" becomes a leaf-
features store keyed by tile_id; drill-down (get_tile miss) re-enters the
same loop from the nearest memoized ancestor's retained features
(lib.rs:184-245), creating any empty tiles it walks through — these count
in stats/total, observably (tests.rs:430 expects total == 37 *after* the
z11 miss lookups).

Scale shape: the frontier is never collected — only the per-tile stats
aggregate (one row per live tile) comes to the driver to evaluate the
stop predicate; feature rows move executor-to-executor through the
emit/groupBy shuffle, keyed identically to the tiles-table partitioning.
The in-memory tile store below is for index-sized outputs (the rendered
tiles, small by construction); sources/tile_sink.py offers the parquet
variant for production pyramids.
"""

from __future__ import annotations

from typing import Dict, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geojson_vt_rs_spark.config import Options
from geojson_vt_rs_spark.core.tiler import to_id
from geojson_vt_rs_spark.operators.pipeline import (
    TILED_COLS,
    convert_stage,
    emit_stage,
    split_stage,
    wrap_stage,
)
from geojson_vt_rs_spark.operators.schema import TILED_FEATURE_SCHEMA


class SparkTile:
    __slots__ = ("z", "x", "y", "features", "num_points", "num_simplified")

    def __init__(self, z, x, y, features, num_points, num_simplified):
        self.z = z
        self.x = x
        self.y = y
        self.features = features  # list of canonical tile-feature dicts
        self.num_points = num_points
        self.num_simplified = num_simplified


EMPTY_TILE = SparkTile(0, 0, 0, [], 0, 0)


class SparkGeoJSONVT:
    """Tile index built by Spark jobs; memoized tiles + leaf features.

    ``features_df`` must be a raw lon/lat features DataFrame
    (FEATURE_SCHEMA, see operators.pipeline.read_geojson_features).
    """

    def __init__(
        self,
        spark: SparkSession,
        features_df: DataFrame,
        options: Optional[Options] = None,
    ):
        self.spark = spark
        self.options = options or Options()
        o = self.options
        self.tiles: Dict[int, SparkTile] = {}
        self.leaf_features: Dict[int, pd.DataFrame] = {}
        self.stats: Dict[int, int] = {}
        self.total = 0

        z2 = 1 << o.max_zoom
        converted = convert_stage(
            features_df, (o.tile.tolerance / o.tile.extent) / z2, o.generate_id
        )
        wrapped = wrap_stage(
            converted, o.tile.buffer / o.tile.extent, o.tile.line_metrics
        )
        frontier = wrapped.select(
            F.lit(0).alias("z"), F.lit(0).alias("x"), F.lit(0).alias("y"), "*"
        )
        self._run(frontier, 0, 0, 0, 0, 0, 0)

    # ------------------------------------------------------------------
    def _register(self, z: int, x: int, y: int, features, np_: int, ns: int):
        tid = to_id(z, x, y)
        if tid in self.tiles:
            return
        self.tiles[tid] = SparkTile(z, x, y, features, np_, ns)
        self.stats[z] = self.stats.get(z, 0) + 1
        self.total += 1

    def _decide(self, z, x, y, num_points, cz, cx, cy):
        """-> 'leaf' (stop+retain) | 'stop' (no retain) | 'split'
        (lib.rs:305-338)."""
        o = self.options
        if cz == 0:
            if z == o.index_max_zoom or num_points <= o.index_max_points:
                return "leaf"
            return "split"
        if z == o.max_zoom:
            return "stop"
        if z == cz:
            return "leaf"
        m = 1 << (cz - z)
        if x != cx // m or y != cy // m:
            return "leaf"
        return "split"

    def _run(self, frontier: DataFrame, rz, rx, ry, cz, cx, cy):
        o = self.options
        first = True
        while True:
            frontier = frontier.persist()
            # render every live tile; stats row (feature_idx=-1) ensures
            # feature-less tiles still appear
            tile_pdf = emit_stage(frontier, o).toPandas()
            if tile_pdf.empty:
                if first:
                    # split_tile(empty, root) still creates the root tile
                    # (lib.rs:265-295 insert happens before the early return)
                    self._register(rz, rx, ry, [], 0, 0)
                frontier.unpersist()
                return
            first = False

            split_keys = []
            leaf_keys = []
            for (z, x, y), grp in tile_pdf.groupby(["z", "x", "y"], sort=False):
                z, x, y = int(z), int(x), int(y)
                np_ = int(grp["num_points"].iloc[0])
                ns = int(grp["num_simplified"].iloc[0])
                feats = _rows_to_tile_features(grp)
                self._register(z, x, y, feats, np_, ns)
                action = self._decide(z, x, y, np_, cz, cx, cy)
                if action == "split":
                    split_keys.append((z, x, y))
                elif action == "leaf":
                    leaf_keys.append((z, x, y))

            if leaf_keys:
                kdf = self.spark.createDataFrame(leaf_keys, "z int, x int, y int")
                leaf_pdf = frontier.join(F.broadcast(kdf), ["z", "x", "y"]).toPandas()
                for key, grp in leaf_pdf.groupby(["z", "x", "y"], sort=False):
                    tid = to_id(int(key[0]), int(key[1]), int(key[2]))
                    self.leaf_features[tid] = grp

            if not split_keys:
                frontier.unpersist()
                return

            sdf = self.spark.createDataFrame(split_keys, "z int, x int, y int")
            survivors = frontier.join(F.broadcast(sdf), ["z", "x", "y"])
            children = split_stage(survivors, o).persist()
            child_keys = {
                (int(r["z"]), int(r["x"]), int(r["y"]))
                for r in children.select("z", "x", "y").distinct().collect()
            }
            # every split parent spawns all 4 children in the reference
            # (lib.rs:344-428 calls split_tile unconditionally); children
            # that received no features become empty memoized tiles
            for z, x, y in split_keys:
                self.leaf_features.pop(to_id(z, x, y), None)  # lib.rs:430-433
                for dx in (0, 1):
                    for dy in (0, 1):
                        ck = (z + 1, 2 * x + dx, 2 * y + dy)
                        if ck not in child_keys:
                            self._register(ck[0], ck[1], ck[2], [], 0, 0)
            frontier.unpersist()
            frontier = children

    # ------------------------------------------------------------------
    def find_parent(self, z, x, y):
        while z != 0:
            z -= 1
            x //= 2
            y //= 2
            tid = to_id(z, x, y)
            if tid in self.tiles:
                return z, x, y
        return None

    def get_tile(self, z: int, x_: int, y: int) -> SparkTile:
        o = self.options
        if z > o.max_zoom:
            raise ValueError(f"Requested zoom higher than maxZoom: {z}")
        z2 = 1 << z
        x = ((x_ % z2) + z2) % z2
        tid = to_id(z, x, y)
        if tid in self.tiles:
            return self.tiles[tid]
        parent = self.find_parent(z, x, y)
        if parent is None:
            raise LookupError("Parent tile not found")
        pz, px, py = parent
        leaf = self.leaf_features.get(to_id(pz, px, py))
        if leaf is None or leaf.empty:
            frontier = self.spark.createDataFrame([], TILED_FEATURE_SCHEMA)
        else:
            frontier = self.spark.createDataFrame(
                leaf[TILED_COLS], TILED_FEATURE_SCHEMA
            )
        self._run(frontier, pz, px, py, z, x, y)
        if tid in self.tiles:
            return self.tiles[tid]
        if self.find_parent(z, x, y) is None:
            raise LookupError("Parent tile not found")
        return EMPTY_TILE

    def get_internal_tiles(self):
        return self.tiles


def _rows_to_tile_features(grp: pd.DataFrame) -> list:
    import json

    feats = []
    sub = grp[grp["feature_idx"] >= 0].sort_values("feature_idx")
    for r in sub.itertuples(index=False):
        feats.append(
            dict(
                type=int(r.type),
                kind=int(r.kind),
                geometry=json.loads(r.geometry_json),
                tags=None if r.tags_json is None else json.loads(r.tags_json),
                id_str=r.id_str if isinstance(r.id_str, str) else None,
                id_num=int(r.id_num) if pd.notna(r.id_num) else None,
            )
        )
    return feats
