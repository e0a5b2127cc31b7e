"""Streaming ingest of image rows into the spatial pipeline.

The reference is strictly batch (SURVEY.md §2.9) — this is the optional
stretch: ``readStream`` over an images directory, each micro-batch pushed
through the SAME batch kernels (footprints -> cells -> per-cell counts /
mosaics) via foreachBatch, with checkpointed exactly-once sink appends.
``availableNow`` processes the backlog and stops — the pattern scales to
a continuous feed unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from geojson_vt_rs_spark.sources.images import IMAGE_SCHEMA


def stream_cell_counts(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    zoom: int = 5,
) -> None:
    """Micro-batch: assign cells and append per-cell counts per batch."""
    from geojson_vt_rs_spark.plans.spatial import with_cells, with_footprints

    stream = spark.readStream.schema(IMAGE_SCHEMA).parquet(src_dir)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        (
            with_cells(with_footprints(batch), zoom)
            .groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_mosaics(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    zoom: int = 5,
) -> None:
    """Micro-batch raster mosaicking (per-batch tiles, epoch-stamped)."""
    from geojson_vt_rs_spark.plans.spatial import (
        mosaic_tiles,
        with_cells,
        with_footprints,
    )

    stream = spark.readStream.schema(IMAGE_SCHEMA).parquet(src_dir)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        tiles = mosaic_tiles(with_cells(with_footprints(batch), zoom), zoom)
        tiles.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            out_dir
        )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
