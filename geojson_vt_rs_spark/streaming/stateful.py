"""Custom stateful streaming operators (applyInPandasWithState).

The reference is strictly batch; the builder brief's streaming scope asks
for watermarked windows (streaming/ingest.py) AND custom stateful
operators via ``applyInPandasWithState``.  The natural stateful operator
for a training-data pipeline is STREAMING DEDUPE: keep the first image
per perceptual hash across all micro-batches ever seen — state is the
set of phashes already emitted, partitioned by group key, checkpointed
with the query so restarts resume exactly.

Scale shape: state lives in the state store partitioned by the group
key (phash), so memory per task is bounded by its key range; no driver
state, no global structures.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from geojson_vt_rs_spark.sources.images import IMAGE_SCHEMA

DEDUPE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("phash", T.LongType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("caption", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("seen", T.BooleanType())])


def _dedupe_fn(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit the first (min image_id) row of a phash the first time the
    phash is ever observed; afterwards the state swallows all repeats."""
    if state.exists:
        return
    best = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        row = pdf.loc[pdf["image_id"].idxmin()]
        if best is None or row["image_id"] < best["image_id"]:
            best = row
    if best is None:
        return
    state.update((True,))
    yield pd.DataFrame(
        [
            dict(
                phash=int(key[0]),
                image_id=best["image_id"],
                caption=best["caption"],
            )
        ]
    )


def stream_dedupe_images(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> None:
    """Streaming first-occurrence dedupe by phash over an images
    directory; emits one row per never-before-seen phash.  The sink uses
    the same idempotent per-epoch overwrite as streaming/ingest.py, so
    replays after a crash are exactly-once effective; the dedupe state
    itself is part of the query checkpoint."""
    import os

    stream = (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    deduped = stream.groupBy("phash").applyInPandasWithState(
        _dedupe_fn,
        outputStructType=DEDUPE_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def handle(batch: DataFrame, epoch_id: int) -> None:
        batch.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={int(epoch_id)}")
        )

    q = (
        deduped.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
