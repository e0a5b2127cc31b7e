"""Deterministic synthetic GeoJSON-feature table at arbitrary scale.

The reference fixtures are tiny (257 KB); exercising the distributed
pyramid's memory/shuffle behavior needs millions of points.  Each row is
a pure function of its index (same policy as sources/images.py): a small
polygon (box with jittered corners) or polyline near a hash-derived
center, with ~30% of features collapsing into 3 dense metro regions to
reproduce hot-tile skew.  Generated distributed via spark.range ->
mapInPandas, raw lon/lat in FEATURE_SCHEMA.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from geojson_vt_rs_spark.core.geom import (
    GEOM_LINESTRING,
    GEOM_POINT,
    GEOM_POLYGON,
    make_feature,
)
from geojson_vt_rs_spark.operators.schema import FEATURE_SCHEMA, features_to_pdf

_METROS = [(-74.0, 40.7), (139.7, 35.7), (2.35, 48.85)]


def _feature(i: int):
    rng = np.random.RandomState((i * 0x9E3779B1) & 0x7FFFFFFF)
    m = i % 10
    if m < 3:
        cx, cy = _METROS[m]
        cx += rng.uniform(-0.5, 0.5)
        cy += rng.uniform(-0.4, 0.4)
    else:
        cx = rng.uniform(-179.0, 179.0)
        cy = rng.uniform(-75.0, 75.0)
    n = 6 + int(rng.randint(0, 10))
    if i % 3 == 0:
        # polyline wandering from the center
        xs = cx + np.cumsum(rng.uniform(-0.05, 0.05, n))
        ys = cy + np.cumsum(rng.uniform(-0.05, 0.05, n))
        zs = np.zeros(n)
        f = make_feature(
            GEOM_LINESTRING,
            [(xs, ys, zs)],
            props_json=f'{{"i":{i}}}',
            feature_seq=i,
        )
    else:
        # jittered box ring (closed)
        w = rng.uniform(0.02, 0.3)
        h = rng.uniform(0.02, 0.3)
        bx = np.array([cx, cx + w, cx + w, cx, cx])
        by = np.array([cy, cy, cy + h, cy + h, cy])
        bx = bx + rng.uniform(-0.005, 0.005, 5)
        by = by + rng.uniform(-0.005, 0.005, 5)
        bx[-1], by[-1] = bx[0], by[0]
        f = make_feature(
            GEOM_POLYGON,
            [(bx, by, np.zeros(5))],
            ring_group_sizes=[1],
            props_json=f'{{"i":{i}}}',
            feature_seq=i,
        )
    f.num_points = len(f.xs)
    return f


def generate_features(spark: SparkSession, n: int, partitions: int = 64) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield features_to_pdf([_feature(int(i)) for i in pdf["id"]])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=FEATURE_SCHEMA)


def _unit(ids: np.ndarray, k: int) -> np.ndarray:
    """Deterministic uniform [0,1) per id (vectorized xorshift mix)."""
    h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
         + np.uint64(k) * np.uint64(0xBF58476D1CE4E5B9))
    h ^= h >> np.uint64(30)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def generate_points(spark: SparkSession, n: int, partitions: int = 64) -> DataFrame:
    """Deterministic point-feature table standing in for the reference's
    stripped ``fixtures/points.geojson`` (benches/benchmark.rs:63-96,
    .MISSING_LARGE_BLOBS): n single-Point features, 20% in a tight
    Washington-DC cluster (covering the benchmark's get_tile(12,1171,1566)
    target), 50% CONUS, 30% world-spread.  Column-wise vectorized build —
    no per-feature Python objects in the generator."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        names = [f.name for f in FEATURE_SCHEMA.fields]
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.int64)
            m = len(ids)
            r1, r2 = _unit(ids, 1), _unit(ids, 2)
            mode = ids % 10
            lon = np.where(
                mode < 2, -77.03 + (r1 - 0.5) * 0.2,
                np.where(mode < 7, -124.0 + r1 * 57.0, -179.0 + r1 * 358.0),
            )
            lat = np.where(
                mode < 2, 38.9 + (r2 - 0.5) * 0.15,
                np.where(mode < 7, 26.0 + r2 * 22.0, -75.0 + r2 * 150.0),
            )
            zero1 = np.zeros(1)
            po = np.array([0, 1], dtype=np.int32)
            data = {k: [None] * m for k in
                    ("id_str", "id_num", "id_float", "props_json",
                     "ring_offsets", "gc_kinds", "gc_part_offsets")}
            data.update(
                feature_seq=ids,
                world_copy=np.ones(m, dtype=np.int32),
                slice_path=[""] * m,
                geom_type=np.full(m, GEOM_POINT, dtype=np.int32),
                xs=[lon[i : i + 1] for i in range(m)],
                ys=[lat[i : i + 1] for i in range(m)],
                zs=[zero1] * m,
                part_offsets=[po] * m,
                part_dist=[zero1] * m,
                part_seg_start=[zero1] * m,
                part_seg_end=[zero1] * m,
                part_area=[zero1] * m,
                bbox_min_x=np.minimum(2.0, lon),
                bbox_min_y=np.minimum(1.0, lat),
                bbox_max_x=np.maximum(-1.0, lon),
                bbox_max_y=np.maximum(0.0, lat),
                num_points=np.ones(m, dtype=np.int32),
            )
            yield pd.DataFrame(data, columns=names)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=FEATURE_SCHEMA)
