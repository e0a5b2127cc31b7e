"""Pure-numpy WAV (RIFF PCM16 mono) codec + deterministic synthetic
audio clips — the audio leg of the multimodal triad (images:
png/jpeg/raw, video: VTV1/rawv, audio: wav/rawa), all REAL codecs,
no library stubs.

The container is canonical RIFF/WAVE: ``RIFF<size>WAVE`` + ``fmt ``
chunk (PCM16 mono) + ``data`` chunk.  PCM is lossless, so the
roundtrip is byte-exact and the driver oracle can recompute features
from the raw generator (the image_stats pattern).

Hostile-header hygiene (the ADVICE-r3/r4 lesson from VTV): every
declared size is bounds-checked against the actual payload BEFORE any
allocation or frombuffer — a tiny buffer claiming a 4 GB data chunk
raises ValueError, never MemoryError.

Synthesis is INTEGER-ONLY (splitmix64-style hash noise over a
triangle-wave tone), so clips are bit-reproducible across platforms
with no float rounding in the generator.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SAMPLE_RATE = 8000

AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("audio_id", T.LongType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("sample_rate", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("bytes", T.BinaryType(), False),
    ]
)

_MIX = np.uint64(0xBF58476D1CE4E5B9)
_MIX2 = np.uint64(0x94D049BB133111EB)


def make_samples(i: int, n: int) -> np.ndarray:
    """Deterministic int16 clip ``i``: triangle tone (period keyed by
    the clip id) + hash noise.  Integer arithmetic only."""
    k = np.arange(n, dtype=np.uint64)
    period = np.uint64(20 + (i * 7) % 180)
    phase = (k % period).astype(np.int64)
    half = int(period) // 2
    tri = np.abs(phase - half) * (8000 // max(half, 1)) - 4000
    with np.errstate(over="ignore"):
        h = (k + np.uint64(i) * np.uint64(0x9E3779B97F4A7C15)) * _MIX
        h ^= h >> np.uint64(27)
        h *= _MIX2
        h ^= h >> np.uint64(31)
    noise = (h & np.uint64(0x7FF)).astype(np.int64) - 1024
    return np.clip(tri + noise, -32768, 32767).astype(np.int16)


def encode_wav(samples: np.ndarray, sample_rate: int = SAMPLE_RATE) -> bytes:
    if samples.dtype != np.int16:
        raise ValueError(f"PCM16 required, got {samples.dtype}")
    data = samples.tobytes()
    byte_rate = sample_rate * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def decode_wav(buf: bytes) -> tuple:
    """(sample_rate, int16 samples).  Every declared size is checked
    against ``len(buf)`` before any allocation."""
    if len(buf) < 44:
        raise ValueError(f"wav: {len(buf)} bytes < 44-byte header")
    if buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("wav: bad RIFF/WAVE magic")
    if buf[12:16] != b"fmt ":
        raise ValueError("wav: missing fmt chunk")
    fmt_len, audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
        "<IHHIIHH", buf[16:36]
    )
    if fmt_len != 16 or audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(
            f"wav: unsupported (fmt_len={fmt_len}, fmt={audio_fmt}, "
            f"ch={channels}, bits={bits}) — PCM16 mono only"
        )
    if buf[36:40] != b"data":
        raise ValueError("wav: missing data chunk")
    (data_len,) = struct.unpack("<I", buf[40:44])
    if data_len % 2 != 0:
        raise ValueError(f"wav: odd data length {data_len}")
    if 44 + data_len > len(buf):
        raise ValueError(
            f"wav: data chunk claims {data_len} bytes, payload has "
            f"{len(buf) - 44}"
        )
    return int(rate), np.frombuffer(buf, dtype="<i2", count=data_len // 2,
                                    offset=44)


def decode_audio(buf: bytes, fmt: str, n_samples: int) -> np.ndarray:
    """Dispatch: 'wav' container or 'rawa' bare little-endian PCM16."""
    if fmt == "wav":
        _, s = decode_wav(buf)
        return s
    if fmt == "rawa":
        if len(buf) != 2 * n_samples:
            raise ValueError(
                f"rawa: expected {2 * n_samples} bytes, got {len(buf)}"
            )
        return np.frombuffer(buf, dtype="<i2")
    raise ValueError(f"unknown audio fmt: {fmt!r}")


def clip_spec(i: int) -> tuple:
    """(fmt, n_samples) for clip ``i`` — the pure function the oracle
    replays."""
    return ("wav", "wav", "rawa")[i % 3], 800 + (i * 37) % 400


def generate_audio(
    spark: SparkSession, n: int, partitions: int = 8
) -> DataFrame:
    """Deterministic audio table: wav/wav/rawa format rotation."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                fmt, ns = clip_spec(i)
                s = make_samples(i, ns)
                b = encode_wav(s) if fmt == "wav" else s.tobytes()
                rows.append(
                    dict(
                        audio_id=i,
                        fmt=fmt,
                        sample_rate=SAMPLE_RATE,
                        n_samples=ns,
                        bytes=b,
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SCHEMA.fields]
            )

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, schema=AUDIO_SCHEMA
    )
