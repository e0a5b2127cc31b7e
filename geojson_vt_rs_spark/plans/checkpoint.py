"""Checkpointed, resumable production pipelines.

Two write paths, both idempotent-resume via per-partition JSON manifests
carrying lineage + row-count metrics (north_rule: "checkpoints per-tile-
partition progress with lineage + row-count metrics for resumability"):

* CheckpointedPyramid — the distributed tile pyramid writing tiles /
  leaf-features / next-level frontiers as parquet per level; a level's
  manifest is written only after all its outputs land, so a killed job
  resumes from the first level without a manifest, re-reading the last
  persisted frontier (no recompute of completed levels).

* checkpointed_mosaic — the raster mosaic sharded into hash buckets of
  cells; completed buckets are skipped on resume.

Everything is written with deterministic content, so a resumed run
produces byte-identical outputs to an uninterrupted one.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geojson_vt_rs_spark.config import Options
from geojson_vt_rs_spark.operators.pipeline import convert_stage, wrap_stage
from geojson_vt_rs_spark.plans.pyramid import (
    K_CHILD,
    K_LEAF,
    K_STATS,
    K_TILE,
    STEP_SCHEMA,
    TILED_COLS,
    _level_kernel,
)


def _manifest_path(out_dir: str, name: str) -> str:
    return os.path.join(out_dir, "_manifests", f"{name}.json")


def _write_manifest(out_dir: str, name: str, payload: dict) -> None:
    path = _manifest_path(out_dir, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh, sort_keys=True)
    os.replace(tmp, path)  # atomic completion marker


def _read_manifest(out_dir: str, name: str) -> Optional[dict]:
    path = _manifest_path(out_dir, name)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


class CheckpointedPyramid:
    """Distributed pyramid with per-level parquet checkpoints.

    Layout under ``out_dir``:
      tiles/z=*/          rendered tile rows (partition-pruned get_tile)
      leaves/z=*/         retained leaf source features (drill-down input)
      frontier/level_N/   the N-th level's input features (resume point)
      _manifests/level_N.json  lineage: row counts per kind, wall time
    """

    def __init__(self, spark: SparkSession, options: Optional[Options] = None):
        self.spark = spark
        self.options = options or Options()

    def run(self, features_df: DataFrame, out_dir: str) -> dict:
        o = self.options
        spark = self.spark
        kernel = _level_kernel(o, 0, 0, 0)
        os.makedirs(out_dir, exist_ok=True)

        level = 0
        frontier = None
        # resume: find the first level without a manifest
        while _read_manifest(out_dir, f"level_{level}") is not None:
            level += 1
        if level > 0:
            m = _read_manifest(out_dir, f"level_{level - 1}")
            if m["n_children"] == 0:
                return self.summary(out_dir)
            frontier = spark.read.parquet(
                os.path.join(out_dir, "frontier", f"level_{level}")
            )
        else:
            z2 = 1 << o.max_zoom
            converted = convert_stage(
                features_df,
                (o.tile.tolerance / o.tile.extent) / z2,
                o.generate_id,
            )
            wrapped = wrap_stage(
                converted, o.tile.buffer / o.tile.extent, o.tile.line_metrics
            )
            frontier = wrapped.select(
                F.lit(0).alias("z"), F.lit(0).alias("x"), F.lit(0).alias("y"), "*"
            )

        while True:
            t0 = time.time()
            fused = (
                frontier.groupBy("z", "x", "y")
                .applyInPandas(kernel, schema=STEP_SCHEMA)
                .persist()
            )
            counts = {
                int(r["row_kind"]): int(r["n"])
                for r in fused.groupBy("row_kind")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            fused.filter(F.col("row_kind").isin(K_TILE, K_STATS)).drop(
                *[f.name for f in STEP_SCHEMA.fields if f.name.startswith("part_")]
            ).select(
                "z", "x", "y", "feature_idx", "type", "kind", "geometry_json",
                "tags_json", "tile_id_str", "tile_id_num", "tile_num_points",
                "tile_num_simplified", "action",
            ).write.mode("append").partitionBy("z").parquet(
                os.path.join(out_dir, "tiles")
            )
            fused.filter(F.col("row_kind") == K_LEAF).select(*TILED_COLS).write.mode(
                "append"
            ).partitionBy("z").parquet(os.path.join(out_dir, "leaves"))
            n_children = counts.get(K_CHILD, 0)
            if n_children:
                fused.filter(F.col("row_kind") == K_CHILD).select(
                    *TILED_COLS
                ).write.mode("overwrite").parquet(
                    os.path.join(out_dir, "frontier", f"level_{level + 1}")
                )
            _write_manifest(
                out_dir,
                f"level_{level}",
                dict(
                    level=level,
                    n_tiles=counts.get(K_STATS, 0),
                    n_tile_feature_rows=counts.get(K_TILE, 0),
                    n_leaf_feature_rows=counts.get(K_LEAF, 0),
                    n_children=n_children,
                    wall_sec=round(time.time() - t0, 3),
                ),
            )
            fused.unpersist()
            if not n_children:
                return self.summary(out_dir)
            frontier = spark.read.parquet(
                os.path.join(out_dir, "frontier", f"level_{level + 1}")
            )
            level += 1

    def summary(self, out_dir: str) -> dict:
        levels = []
        i = 0
        while (m := _read_manifest(out_dir, f"level_{i}")) is not None:
            levels.append(m)
            i += 1
        return dict(
            levels=len(levels),
            total_tiles=sum(m["n_tiles"] for m in levels),
            total_tile_rows=sum(m["n_tile_feature_rows"] for m in levels),
            manifests=levels,
        )

    def read_tile(self, out_dir: str, z: int, x: int, y: int) -> DataFrame:
        """Partition-pruned point lookup on the tiles table (get_tile
        memo-hit path, lib.rs:193-195)."""
        return (
            self.spark.read.parquet(os.path.join(out_dir, "tiles"))
            .filter((F.col("z") == z) & (F.col("x") == x) & (F.col("y") == y))
            .filter(F.col("feature_idx") >= 0)
            .orderBy("feature_idx")
        )


def checkpointed_mosaic(
    images_pts: DataFrame,
    zoom: int,
    out_dir: str,
    n_buckets: int = 8,
) -> dict:
    """Raster mosaic sharded into hash buckets of tiles; each bucket is a
    separately-committed unit of progress with row-count lineage."""
    from geojson_vt_rs_spark.plans.spatial import mosaic_tiles

    os.makedirs(out_dir, exist_ok=True)
    done = []
    for b in range(n_buckets):
        name = f"mosaic_bucket_{b}"
        m = _read_manifest(out_dir, name)
        if m is not None:
            done.append(m)
            continue
        t0 = time.time()
        part = images_pts.filter(
            F.pmod(F.col("cx") * 31 + F.col("cy"), F.lit(n_buckets)) == b
        )
        tiles = mosaic_tiles(part, zoom).persist()
        stats = tiles.agg(
            F.count(F.lit(1)).alias("n_tiles"),
            F.coalesce(F.sum("n_images"), F.lit(0)).alias("n_images"),
            F.coalesce(F.sum("src_bytes"), F.lit(0)).alias("src_bytes"),
        ).collect()[0]
        tiles.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"bucket={b}")
        )
        tiles.unpersist()
        m = dict(
            bucket=b,
            n_tiles=int(stats["n_tiles"]),
            n_images=int(stats["n_images"]),
            src_bytes=int(stats["src_bytes"]),
            wall_sec=round(time.time() - t0, 3),
        )
        _write_manifest(out_dir, name, m)
        done.append(m)
    return dict(
        buckets=len(done),
        n_tiles=sum(m["n_tiles"] for m in done),
        n_images=sum(m["n_images"] for m in done),
        manifests=done,
    )
