"""Streaming gap sessionization — the Structured Streaming twin of
``operators/sessions.sessionize`` — via Spark's NATIVE
``session_window`` (merging-interval state in the state store; fully
declarative, no Python in the stream).

Gap-boundary parity: the batch operator keeps a session alive when
``us - prev_us <= gap_us`` (strict ``>`` splits).  ``session_window``
merges INCLUSIVELY — an event landing exactly on the previous
session's end (``diff == gap``) still merges (verified empirically:
``diff == gap + 1`` splits) — so the same ``gap_us`` reproduces the
batch boundary bit-for-bit.  The parity test asserts equality of the
rollups across all three formulations.

Append mode: a session row emits exactly once, when the watermark
(max event time − delay) passes ``session.end = last_event + gap`` —
so a session is only ever finalized by later data, the same contract
as any event-time aggregation.  Per-epoch overwrite sink (idempotent
replays after crashes), exactly like streaming/ingest.py.

At 100 TB: state is per-(user, open-session) in the state store
(partitioned by the group key); late rows beyond the watermark drop;
nothing accumulates on the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ingest import EVENT_SCHEMA

SESSION_OUT_COLS = [
    "user_id",
    "n_events",
    "start_us",
    "end_us",
    "duration_us",
    "sum_value_cents",
]


def _session_rollup(stream: DataFrame, gap_us: int) -> DataFrame:
    us = F.unix_micros(F.col("ts"))
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return (
        stream.withColumn("_us", us)
        .withColumn("_cents", cents)
        .groupBy(
            F.session_window("ts", f"{gap_us} microseconds"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
            (F.max("_us") - F.min("_us")).alias("duration_us"),
            F.sum("_cents").alias("sum_value_cents"),
        )
        .select(*SESSION_OUT_COLS)
    )


def stream_sessionize(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_us: int,
    watermark: str = "0 seconds",
    max_files_per_trigger: int = 1,
) -> None:
    """Watermarked streaming sessionization over an event directory.

    Emits one row per CLOSED session (watermark passed its end) into
    per-epoch overwrite dirs.  Sessions still open when the stream
    drains stay in state — finalize them by appending later data (the
    test ships far-future sentinel rows) or rerunning as data arrives.
    """
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    agg = _session_rollup(stream.withWatermark("ts", watermark), gap_us)

    def handle(batch: DataFrame, epoch_id: int) -> None:
        batch.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={int(epoch_id)}")
        )

    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def batch_session_rollup(events: DataFrame, gap_us: int) -> DataFrame:
    """The same native-session_window rollup in BATCH mode — a third,
    independent engine-side formulation of gap sessions (used by the
    parity test against operators/sessions.sessionize)."""
    return _session_rollup(events, gap_us)
