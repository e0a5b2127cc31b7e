"""Streaming ingest of image rows into the spatial pipeline.

The reference is strictly batch (SURVEY.md §2.9) — this is the optional
stretch: ``readStream`` over an images directory, each micro-batch pushed
through the SAME batch kernels (footprints -> cells -> per-cell counts /
mosaics) via foreachBatch.  Exactly-once EFFECTIVE semantics: foreachBatch
itself is at-least-once (a crash between the sink write and the epoch
commit replays the micro-batch), so each epoch OVERWRITES its own
``epoch=<id>`` partition directory — the replay is idempotent and readers
of the root path never see duplicates.  ``availableNow`` processes the
backlog and stops — the pattern scales to a continuous feed unchanged.
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
            # idempotent per-epoch dir: a replayed micro-batch overwrites
            # its own partition instead of double-appending
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"epoch={int(epoch_id)}"))
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
        # idempotent per-epoch dir (see module docstring)
        tiles.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={int(epoch_id)}")
        )

    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
