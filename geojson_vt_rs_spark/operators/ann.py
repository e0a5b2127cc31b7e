"""Approximate nearest neighbor over embedding columns.

Two tiers (build brief: "brute-force cosine top-k as the baseline; an
IVF or LSH-bucketed variant as the scale path"):

* exact_topk       — brute force against a broadcast query vector
                     (operators/text_dedup.ann_topk has the oracle twin).
* lsh_topk         — random-hyperplane LSH: b sign bits per vector form a
                     bucket id; candidates come from the query's bucket
                     plus all buckets at hamming distance <= probe_radius
                     (multi-probe), then exact cosine rescoring.  Shrinks
                     the scan from O(n) to O(n / 2^b * probes) at
                     measured recall (tests/test_ann.py).

Hyperplanes are a pure function of (seed, dim) -> identical on every
executor, no fitting step, resumable.  The sign-bit computation is a
vectorized numpy matmul inside one Arrow batch pass.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, bits))


def with_lsh_bucket(
    emb: DataFrame, dim: int, bits: int = 8, seed: int = 42,
    vec_col: str = "embedding", out: str = "bucket",
) -> DataFrame:
    """Add the random-hyperplane sign-bucket id (one matmul per batch)."""
    H = _hyperplanes(dim, bits, seed)
    weights = (1 << np.arange(bits)).astype(np.int64)
    fields = [f.name for f in emb.schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (M @ H) > 0
            pdf[out] = (signs @ weights).astype(np.int64)
            yield pdf

    out_schema = emb.withColumn(out, F.lit(0).cast("long")).schema
    return emb.mapInPandas(kernel, schema=out_schema)


def with_ivf_cell(
    emb: DataFrame,
    centroids: list,  # list of (cid, vector)
    vec_col: str = "embedding",
    out: str = "ivf_cell",
) -> DataFrame:
    """IVF coarse quantizer: assign each vector to its nearest centroid
    (cosine).  Centroids are data rows chosen deterministically (no
    training step needed for a coarse index); one numpy matmul per
    Arrow batch."""
    C = np.stack([np.asarray(v, dtype=np.float64) for _, v in centroids])
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    cids = np.asarray([c for c, _ in centroids], dtype=np.int64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            sims = M @ C.T
            pdf[out] = cids[np.argmax(sims, axis=1)]
            yield pdf

    out_schema = emb.withColumn(out, F.lit(0).cast("long")).schema
    return emb.mapInPandas(kernel, schema=out_schema)


def ivf_topk(
    emb: DataFrame,
    query_vec: list,
    centroids: list,
    k: int = 20,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-bucketed cosine top-k: probe the n_probe centroids nearest
    the query, exact-rescore only their members (the scale path beside
    lsh_topk; recall measured in tests/test_ann_salting.py)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q))
    C = np.stack([np.asarray(v, dtype=np.float64) for _, v in centroids])
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    cids = [c for c, _ in centroids]
    sims = (C @ (q / qn))
    probes = [cids[i] for i in np.argsort(-sims)[:n_probe]]

    bucketed = with_ivf_cell(emb, centroids, vec_col=vec_col)
    cand = bucketed.filter(F.col("ivf_cell").isin([int(p) for p in probes]))

    d = cand.select(
        id_col,
        F.expr(f"transform({vec_col}, v -> cast(v as double))").alias("emb"),
    ).withColumn("q", F.array(*[F.lit(float(v)) for v in query_vec]))
    dot = F.expr(
        "aggregate(zip_with(emb, q, (a, b) -> a * b), 0D, (acc, v) -> acc + v)"
    )
    nrm = F.expr(
        "sqrt(aggregate(transform(emb, a -> a * a), 0D, (acc, v) -> acc + v))"
    )
    scored = d.withColumn("cos", dot / (nrm * F.lit(qn)))
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "rnk", "cos")
    )


def lsh_topk(
    emb: DataFrame,
    query_vec: list,
    k: int = 20,
    bits: int = 6,
    probe_radius: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed cosine top-k: prune to multi-probe buckets, rescore
    exactly, rank with a deterministic tie-break."""
    dim = len(query_vec)
    H = _hyperplanes(dim, bits, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = (q @ H) > 0
    weights = (1 << np.arange(bits)).astype(np.int64)
    qbucket = int((qbits @ weights))
    # multi-probe: buckets within hamming distance <= probe_radius
    probes = [qbucket]
    if probe_radius >= 1:
        probes += [qbucket ^ (1 << i) for i in range(bits)]
    if probe_radius >= 2:
        probes += [
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(bits)
            for j in range(i + 1, bits)
        ]

    bucketed = with_lsh_bucket(emb, dim, bits, seed, vec_col=vec_col)
    cand = bucketed.filter(F.col("bucket").isin(probes))

    qn = float(np.sqrt((q * q).sum()))
    d = cand.select(
        id_col,
        F.expr(f"transform({vec_col}, v -> cast(v as double))").alias("emb"),
    ).withColumn("q", F.array(*[F.lit(float(v)) for v in query_vec]))
    dot = F.expr(
        "aggregate(zip_with(emb, q, (a, b) -> a * b), 0D, (acc, v) -> acc + v)"
    )
    nrm = F.expr(
        "sqrt(aggregate(transform(emb, a -> a * a), 0D, (acc, v) -> acc + v))"
    )
    scored = d.withColumn("cos", dot / (nrm * F.lit(qn)))
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "rnk", "cos")
    )
