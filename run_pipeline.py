"""spark-submit entrypoint for the full graft pipeline.

    spark-submit --master local[32] --py-files geojson_vt_rs_spark.zip \
        run_pipeline.py --n-images 100000 --zoom 5 \
        --geojson /root/reference/fixtures/us-states.json \
        --out /tmp/graft_out [--images-parquet DIR]

Stages: synthesize (or read) the image+caption table -> deterministic
geo-footprints -> quad-cell assignment -> PIP join vs clipped tile
polygons -> kNN(3) to neighbor tiles -> checkpointed raster mosaic with
per-bucket lineage manifests.  Re-running with the same --out resumes
from completed buckets.  Prints a one-line JSON metrics summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=10000)
    ap.add_argument("--zoom", type=int, default=5)
    ap.add_argument(
        "--geojson", default="/root/reference/fixtures/us-states.json"
    )
    ap.add_argument("--out", required=True)
    ap.add_argument("--images-parquet", default=None,
                    help="read an existing images table instead of synthesizing")
    ap.add_argument("--buckets", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("geojson-vt-graft").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from geojson_vt_rs_spark.plans.checkpoint import checkpointed_mosaic
    from geojson_vt_rs_spark.plans.spatial import (
        build_tile_polygons,
        knn_neighbor_tiles,
        pip_join,
        with_cells,
        with_footprints,
    )
    from geojson_vt_rs_spark.sources.images import IMAGE_SCHEMA, generate_images

    t0 = time.time()
    if args.images_parquet:
        images = spark.read.schema(IMAGE_SCHEMA).parquet(args.images_parquet)
    else:
        images = generate_images(
            spark, args.n_images, spark.sparkContext.defaultParallelism * 2
        )
    pts = with_cells(with_footprints(images), args.zoom).persist()
    n_rows = pts.count()

    polys, index = build_tile_polygons(spark, args.geojson, args.zoom)
    centers = spark.createDataFrame(
        [
            (t.x, t.y)
            for t in index.get_internal_tiles().values()
            if t.z == args.zoom and t.features
        ],
        "x long, y long",
    )

    pip = pip_join(pts, polys, args.zoom)
    pip.write.mode("overwrite").parquet(os.path.join(args.out, "pip"))
    n_pip = spark.read.parquet(os.path.join(args.out, "pip")).count()

    knn = knn_neighbor_tiles(pts, centers, args.zoom, k=3)
    knn.write.mode("overwrite").parquet(os.path.join(args.out, "knn"))
    n_knn = spark.read.parquet(os.path.join(args.out, "knn")).count()

    mosaic_summary = checkpointed_mosaic(
        pts, args.zoom, os.path.join(args.out, "mosaic"), n_buckets=args.buckets
    )

    dt = time.time() - t0
    print(
        json.dumps(
            dict(
                rows=n_rows,
                pip_rows=n_pip,
                knn_rows=n_knn,
                mosaic_tiles=mosaic_summary["n_tiles"],
                mosaic_buckets=mosaic_summary["buckets"],
                wall_sec=round(dt, 3),
                rows_per_sec=round(n_rows / dt, 1),
            )
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
