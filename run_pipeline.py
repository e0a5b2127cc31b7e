"""spark-submit entrypoint for the full graft pipeline.

    spark-submit --master local[32] --py-files geojson_vt_rs_spark.zip \
        run_pipeline.py --n-images 100000 --zoom 5 \
        --geojson /root/reference/fixtures/us-states.json \
        --out /tmp/graft_out [--images-parquet DIR]

Stages: synthesize (or read) the image+caption table -> deterministic
geo-footprints -> quad-cell assignment -> PIP join vs clipped tile
polygons -> kNN(3) to neighbor tiles -> checkpointed raster mosaic with
per-bucket lineage manifests.  Re-running with the same --out resumes
from completed buckets.  With --tile-store, the run ALSO builds the
vector-tile pyramid of --geojson through CheckpointedPyramid (per-level
exactly-once parquet commits with lineage manifests) and reports its
tile totals — re-runs resume from the first uncommitted level, and a
--drill Z,X,Y exercises a get_tile through the store.  Prints a
one-line JSON metrics summary.
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
    ap.add_argument("--tile-store", action="store_true",
                    help="also build the --geojson vector-tile pyramid "
                         "through the checkpointed parquet store")
    ap.add_argument("--drill", default=None, metavar="Z,X,Y",
                    help="with --tile-store: get_tile through the store "
                         "(memo hit or one-pass drill-down on miss)")
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

    metrics = dict(
        rows=n_rows,
        pip_rows=n_pip,
        knn_rows=n_knn,
        mosaic_tiles=mosaic_summary["n_tiles"],
        mosaic_buckets=mosaic_summary["buckets"],
    )

    if args.tile_store:
        from geojson_vt_rs_spark.config import Options
        from geojson_vt_rs_spark.operators.pipeline import (
            read_geojson_features,
        )
        from geojson_vt_rs_spark.plans.checkpoint import CheckpointedPyramid

        store_dir = os.path.join(args.out, "tile_store")
        cp = CheckpointedPyramid(
            spark, Options(max_zoom=14, index_max_zoom=7, index_max_points=200)
        )
        s = cp.run(read_geojson_features(spark, args.geojson), store_dir)
        metrics.update(
            tile_store_levels=s["levels"],
            tile_store_tiles=s["total_tiles"],
            tile_store_rows=s["total_tile_rows"],
        )
        if args.drill:
            dz, dx, dy = (int(v) for v in args.drill.split(","))
            metrics["drill_features"] = cp.get_tile(
                store_dir, dz, dx, dy
            ).count()

    dt = time.time() - t0
    metrics.update(wall_sec=round(dt, 3), rows_per_sec=round(n_rows / dt, 1))
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
