"""Multimodal column operators: decode / feature-extract / resize /
frame-sample over opaque binary columns (build brief §multimodal).

The container has no imaging/video libraries, so the codecs are
implemented here (same move as sources/png.py / sources/jpeg.py):
  * images: pure-numpy PNG + baseline JPEG codecs + raw RGB.
  * video: two REAL formats, no stubs —
      'vtv'  — a self-describing container (magic "VTV1", header with
               w/h/n_frames, length-prefixed PNG-compressed frames:
               an MJPEG-shaped layout).  The decoder parses the
               container itself; the row's w/h/n_frames metadata is
               validated against the header, not trusted.
      'rawv' — n_frames raw RGB frames concatenated (header-less;
               the metadata columns supply the shape).
    Swapping in pyav/ffmpeg for H.264 in production replaces only
    _decode_frames; the Spark-side plumbing (schema, partitioning,
    Arrow batch shape, in-batch explode) is identical.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from geojson_vt_rs_spark.sources.images import make_pixels
from geojson_vt_rs_spark.sources.png import decode_png, encode_png

VIDEO_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
    ]
)

_VTV_MAGIC = b"VTV1"


def make_frames(i: int, w: int = 16, h: int = 16, n_frames: int = 12) -> list:
    """The deterministic frame stack of video i (pure function of i)."""
    return [make_pixels(i * 1000 + f, w, h) for f in range(n_frames)]


def encode_vtv(frames: list) -> bytes:
    """Frames -> VTV1 container: magic + (w, h, n_frames) header +
    length-prefixed PNG payload per frame."""
    h, w = frames[0].shape[:2]
    out = bytearray(_VTV_MAGIC)
    out += struct.pack(">HHI", w, h, len(frames))
    for fr in frames:
        payload = encode_png(fr)
        out += struct.pack(">I", len(payload))
        out += payload
    return bytes(out)


def decode_vtv(data: bytes) -> np.ndarray:
    """VTV1 container -> (n_frames, h, w, 3) uint8.  The header is
    UNTRUSTED: the frame count is bound-checked against the payload size,
    the output array is not allocated until the first frame has decoded
    and matched the header dims, and every malformation raises
    ValueError."""
    data = bytes(data)
    if len(data) < 12:
        raise ValueError("truncated VTV1 container (no header)")
    if data[:4] != _VTV_MAGIC:
        raise ValueError("not a VTV1 container")
    w, h, n = struct.unpack(">HHI", data[4:12])
    # each frame needs at least its 4-byte length prefix, so a hostile
    # n_frames cannot force a multi-GB np.empty
    if n * 4 > len(data) - 12:
        raise ValueError(
            f"VTV1 header claims {n} frames but payload is "
            f"{len(data) - 12} bytes"
        )
    pos = 12
    # h/w are ALSO untrusted (uint16 each): the frames array is not
    # allocated until the FIRST frame has decoded and matched the header
    # dims, so a tiny payload claiming (65535, 65535, 1) fails the shape
    # check instead of forcing a ~12.9 GB np.empty (ADVICE r4)
    frames = None
    if n == 0:
        return np.empty((0, h, w, 3), dtype=np.uint8)
    for fi in range(n):
        if pos + 4 > len(data):
            raise ValueError("truncated VTV1 container (frame prefix)")
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        pos += 4
        if pos + ln > len(data):
            raise ValueError("truncated VTV1 container (frame payload)")
        try:
            frame = decode_png(data[pos : pos + ln])
        except ValueError:
            raise
        except Exception as e:  # PNG-layer struct/zlib errors
            raise ValueError(f"malformed VTV1 frame {fi}: {e}") from e
        if frame.shape[:2] != (h, w):
            raise ValueError(
                f"VTV1 frame {fi} is {frame.shape[:2]}, header says "
                f"{(h, w)}"
            )
        if frames is None:
            frames = np.empty((n, h, w, 3), dtype=np.uint8)
        frames[fi] = frame
        pos += ln
    return frames


def make_video_bytes(i: int, w: int = 16, h: int = 16, n_frames: int = 12) -> bytes:
    """Deterministic raw video: n_frames raw RGB frames concatenated."""
    return b"".join(f.tobytes() for f in make_frames(i, w, h, n_frames))


def generate_videos(spark: SparkSession, n: int, partitions: int = 8) -> DataFrame:
    """Distributed deterministic video table; even ids are VTV1
    containers, odd ids raw concatenated frames — both decode paths are
    exercised by every downstream test/query."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                fmt = "vtv" if i % 2 == 0 else "rawv"
                data = (
                    encode_vtv(make_frames(i))
                    if fmt == "vtv"
                    else make_video_bytes(i)
                )
                rows.append(
                    dict(
                        video_id=f"vid{i:06d}",
                        bytes=data,
                        w=16,
                        h=16,
                        n_frames=12,
                        fmt=fmt,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_SCHEMA.fields])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=VIDEO_SCHEMA)


def _decode_frames(data: bytes, w: int, h: int, n_frames: int, fmt: str) -> np.ndarray:
    if fmt == "vtv":
        frames = decode_vtv(data)
        if frames.shape != (n_frames, h, w, 3):
            raise ValueError(
                f"vtv header {frames.shape} != row metadata "
                f"{(n_frames, h, w, 3)}"
            )
        return frames
    if fmt == "rawv":
        return np.frombuffer(bytes(data), dtype=np.uint8).reshape(
            n_frames, h, w, 3
        )
    raise ValueError(f"unknown video fmt {fmt!r}")


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_png", T.BinaryType()),
        T.StructField("mean_lum", T.DoubleType()),
    ]
)


def frame_sample(videos: DataFrame, every: int = 4) -> DataFrame:
    """Sample every k-th frame of each video, emit it as PNG + a cheap
    feature (mean luminance).  One video row -> ceil(n/every) frame rows;
    the explode happens inside the Arrow batch, no driver involvement."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                frames = _decode_frames(
                    r.bytes, int(r.w), int(r.h), int(r.n_frames), r.fmt
                )
                for fi in range(0, len(frames), every):
                    fr = frames[fi]
                    out.append(
                        dict(
                            video_id=r.video_id,
                            frame_idx=fi,
                            frame_png=encode_png(fr),
                            mean_lum=float(fr.astype(np.float64).mean()),
                        )
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    return videos.mapInPandas(kernel, schema=FRAME_SCHEMA)
