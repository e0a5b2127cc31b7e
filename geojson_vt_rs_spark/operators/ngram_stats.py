"""Corpus-level frequent n-grams: the boilerplate / template detector
(the "most common trigrams" pass every curation pipeline runs before
writing boilerplate-strip rules).

Shape at 100 TB: classic word-count — the n-gram stream explodes but
partial aggregation combines map-side, so the shuffle carries one row
per DISTINCT gram per partition, not the token stream; the final cut
is a TakeOrderedAndProject under a total order (count DESC, gram ASC
— byte-wise string comparison in both engines), never a global sort.

Catalyst: the generator is ``explode_outer`` + not-null filter (the
house rule — a plain ``explode`` over the computed gram array lets
Catalyst infer ``size(arr) > 0`` and push the whole tokenizer below
the exchange as a scan-side filter).  Tokenization/gram exprs are the
SHARED helpers from decontam.py, so the oracle twin is byte-identical
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import _duck_ngrams, _spark_ngrams


def topk_ngrams(docs: DataFrame, n: int = 3, k: int = 100) -> DataFrame:
    """Top-``k`` most frequent word ``n``-grams with counts.

    Output (gram, cnt) under the deterministic total order
    (cnt DESC, gram ASC); ties at the cut resolve identically in both
    engines (binary string comparison).
    """
    grams = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode_outer(F.expr(_spark_ngrams(n))).alias("gram"))
        .filter(F.col("gram").isNotNull())
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("gram").asc())
        .limit(k)
    )


def duck_topk_ngrams_sql(
    table: str = "documents", n: int = 3, k: int = 100
) -> str:
    return (
        f"WITH g AS (SELECT unnest({_duck_ngrams(n)}) AS gram "
        f"FROM {table} WHERE text IS NOT NULL) "
        f"SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM g "
        f"GROUP BY gram ORDER BY cnt DESC, gram LIMIT {k}"
    )
