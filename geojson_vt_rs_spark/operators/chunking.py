"""Global concat-and-chunk packing (GPT-style pretraining prep):
conceptually concatenate every document's tokens in doc_id order and
cut the stream into fixed-length chunks of ``chunk_len`` tokens; emit
per-chunk composition stats.

The hard part at 100 TB is the GLOBAL running token offset, which a
naive formulation computes with an unpartitioned window (one task
sees the whole corpus).  The scale-safe two-phase shape used here:

1. per-doc token counts (shared ``_spark_words`` tokenizer, pure JVM);
2. docs bucket by ``doc_id DIV bucket_width`` — ORDERED id ranges, so
   bucket order == doc order; per-bucket token sums (a partial-agg
   shuffle of n_buckets rows) come back to the driver, which
   prefix-sums them (bounded scalar work, same class as the pyramid's
   split decisions) and broadcasts the n_buckets offsets back as a
   literal dimension;
3. within-bucket running sums via a window PARTITIONED by bucket —
   never a global sort;
4. each doc's token span [start, start+n) overlaps chunks
   ``start DIV L .. (start+n-1) DIV L``; ``explode_outer`` over that
   sequence (+ not-null filter — the house Catalyst rule) fans each
   doc to the bounded ceil(n/L)+1 chunks it feeds, and a final
   partial-agg groupBy(chunk_id) rolls up composition.

Everything is BIGINT arithmetic (token counts, offsets, DIV), so the
DuckDB oracle — a plain global window running sum, the formulation
the engine deliberately avoids — matches byte-for-byte.

Skew note: ``doc_id DIV bucket_width`` assumes roughly uniform id
density (true for ingest-sequential ids).  For pathological id
distributions pick bucket boundaries from an id histogram first; the
within-bucket window spills, so correctness never depends on balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text_dedup import _spark_words


def chunk_pack(
    docs: DataFrame,
    chunk_len: int = 512,
    bucket_width: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-chunk packing stats over the doc_id-ordered token stream.

    Output: (chunk_id, n_docs, first_doc_id, last_doc_id,
    chunk_tokens) — ``chunk_tokens == chunk_len`` everywhere but the
    tail chunk; docs with no tokens (null/empty text) occupy no
    stream positions and join no chunk.
    """
    counted = docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(
            F.expr(f"size({_spark_words()})"), F.lit(0)
        ).cast("bigint").alias("n_tok"),
    ).withColumn("bucket", F.expr(f"doc_id DIV {bucket_width}"))
    # materialized once (lazy localCheckpoint): the phase-2 collect and
    # the phase-3 spans join both consume `counted` — without this each
    # re-scanned and re-tokenized the whole corpus (ADVICE r5); the
    # checkpointed storage is freed when the returned plan is GC'd
    counted = counted.localCheckpoint(eager=False)

    # phase 2: per-bucket sums -> driver prefix scan (n_buckets scalars;
    # bucket_width bounds the driver's work at n_docs / bucket_width
    # rows — for corpora where ids grow beyond ~256M docs, raise
    # bucket_width so n_buckets stays in the low millions, the same
    # bounded-driver class as the pyramid's split decisions)
    per_bucket = (
        counted.groupBy("bucket")
        .agg(F.sum("n_tok").alias("btok"))
        .orderBy("bucket")
        .collect()
    )
    offsets, acc = [], 0
    for r in per_bucket:
        offsets.append((r["bucket"], acc))
        acc += r["btok"]
    spark = docs.sparkSession
    from .schema import local_relation_df

    off_df = F.broadcast(
        local_relation_df(spark, offsets, "bucket long, bucket_off long")
    )

    # phase 3: within-bucket running sum (partitioned window)
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        counted.join(off_df, "bucket")
        .withColumn("_run", F.sum("n_tok").over(w))
        .select(
            "doc_id",
            "n_tok",
            (F.col("bucket_off") + F.col("_run") - F.col("n_tok")).alias(
                "start"
            ),
        )
        .filter(F.col("n_tok") > 0)
    )

    # phase 4: fan each doc to its overlapped chunks, roll up
    L = int(chunk_len)
    fanned = spans.select(
        "doc_id",
        "n_tok",
        "start",
        F.explode_outer(
            F.sequence(
                F.expr(f"start DIV {L}"),
                F.expr(f"(start + n_tok - 1) DIV {L}"),
            )
        ).alias("chunk_id"),
    ).filter(F.col("chunk_id").isNotNull())
    contrib = F.least(
        F.col("start") + F.col("n_tok"), (F.col("chunk_id") + 1) * L
    ) - F.greatest(F.col("start"), F.col("chunk_id") * L)
    return fanned.groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
        F.sum(contrib).alias("chunk_tokens"),
    )


def duck_chunk_pack_sql(
    table: str = "documents",
    chunk_len: int = 512,
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin: the PLAIN global running-sum window the engine
    side deliberately decomposes — an independent formulation of the
    same integer arithmetic."""
    from .text_dedup import _duck_words

    L = int(chunk_len)
    return (
        f"WITH c AS (SELECT {id_col} AS doc_id, "
        f"CAST(coalesce(len({_duck_words()}), 0) AS BIGINT) AS n_tok "
        f"FROM {table}), "
        f"s AS (SELECT doc_id, n_tok, "
        f"CAST(sum(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED "
        f"PRECEDING AND CURRENT ROW) - n_tok AS BIGINT) AS start "
        f"FROM c), "
        f"f AS (SELECT doc_id, n_tok, start, "
        f"unnest(range(start // {L}, (start + n_tok - 1) // {L} + 1)) "
        f"AS chunk_id FROM s WHERE n_tok > 0) "
        f"SELECT chunk_id, CAST(count(*) AS BIGINT) AS n_docs, "
        f"min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id, "
        f"CAST(sum(least(start + n_tok, (chunk_id + 1) * {L}) - "
        f"greatest(start, chunk_id * {L})) AS BIGINT) AS chunk_tokens "
        f"FROM f GROUP BY chunk_id"
    )
