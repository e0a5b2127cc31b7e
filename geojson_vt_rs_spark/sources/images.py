"""Deterministic synthetic image+caption table (BASELINE.json input_hint
shape: image_id, bytes, w, h, fmt, caption, phash).

Generated DISTRIBUTED: spark.range(n) -> mapInPandas, so the same code
path scales from the 10k-row test table to the 10^12-row production
shape (each row is a pure function of its index; no driver loop, no
external data).  fmt rotates over 'png' (real codec, sources/png.py),
'jpeg' (real baseline-DCT codec, sources/jpeg.py — lossy, so phash is
the INGEST-time hash of the source pixels, the usual production
convention) and 'raw' (uncompressed RGB bytes).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from geojson_vt_rs_spark.sources.jpeg import decode_jpeg, encode_jpeg
from geojson_vt_rs_spark.sources.png import decode_png, encode_png

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)

_SIZES = (16, 24, 32)


def make_pixels(i: int, w: int, h: int) -> np.ndarray:
    """Seeded gradient + per-row noise; pure function of (i, w, h)."""
    rng = np.random.RandomState((i * 2654435761) & 0x7FFFFFFF)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy + i) % 256),
        ],
        axis=-1,
    ).astype(np.int32)
    noise = rng.randint(-16, 17, size=(h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def compute_phash(rgb: np.ndarray) -> int:
    """64-bit average hash of an 8x8 grayscale downsample (block mean)."""
    g = rgb.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for r in range(8):
        for c in range(8):
            blocks[r, c] = g[ys[r] : max(ys[r + 1], ys[r] + 1),
                             xs[c] : max(xs[c + 1], xs[c] + 1)].mean()
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def make_image_row(i: int) -> dict:
    w = _SIZES[i % len(_SIZES)]
    h = _SIZES[(i // 3) % len(_SIZES)]
    rgb = make_pixels(i, w, h)
    fmt = ("png", "png", "jpeg", "raw")[i % 4]
    if fmt == "png":
        data = encode_png(rgb)
    elif fmt == "jpeg":
        data = encode_jpeg(rgb)
    else:
        data = rgb.tobytes()
    return dict(
        image_id=f"img{i:08d}",
        bytes=data,
        w=w,
        h=h,
        fmt=fmt,
        caption=f"caption for img{i:08d}",
        phash=compute_phash(rgb),
    )


def decode_image(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(bytes(data))
    if fmt == "raw":
        return np.frombuffer(bytes(data), dtype=np.uint8).reshape(h, w, 3)
    if fmt == "jpeg":  # pure-numpy baseline codec (sources/jpeg.py)
        return decode_jpeg(bytes(data))
    raise ValueError(f"unknown fmt {fmt}")


def generate_images(spark: SparkSession, n: int, partitions: int = 32) -> DataFrame:
    """Distributed deterministic generation of n image rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [make_image_row(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_SCHEMA.fields])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=IMAGE_SCHEMA)
