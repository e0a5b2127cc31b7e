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

from geojson_vt_rs_spark.core.geom import GEOM_LINESTRING, GEOM_POLYGON, make_feature
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
