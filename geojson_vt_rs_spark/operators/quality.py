"""Repetition quality signals: distinct-token and duplicate-bigram
counts per document — the standard "boilerplate / degenerate repetition"
filter of a training-data pipeline (highly repetitive documents are
low-value and skew loss).

Integer-exact counts only (no float ratios cross the oracle boundary;
consumers divide at the edge), all pure JVM column expressions reusing
the let-bound n-gram chain from operators/decontam.py.  Row-local —
scales linearly with the scan, no shuffle.

No reference counterpart (maxammann/geojson-vt-rs is a vector-tile
engine); sits beside text_dedup/sampling/decontam/pii as the graft's
training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import _duck_ngrams, _spark_ngrams


def with_repetition(docs: DataFrame) -> DataFrame:
    """Adds ``n_tokens``, ``n_distinct_tokens``, ``n_dup_bigrams``
    (bigram occurrences beyond each bigram's first) as long columns.
    Null text yields nulls; docs with < 2 tokens have 0 dup bigrams.

    The shared n-gram exprs hard-bind the ``text`` column; rename
    upstream (``df.withColumnRenamed``) to score a different column.
    """
    w1 = _spark_ngrams(1)
    w2 = _spark_ngrams(2)
    return (
        docs.withColumn("n_tokens", F.expr(f"size({w1})").cast("long"))
        .withColumn(
            "n_distinct_tokens",
            F.expr(f"size(array_distinct({w1}))").cast("long"),
        )
        .withColumn(
            "n_dup_bigrams",
            F.expr(f"size({w2}) - size(array_distinct({w2}))").cast("long"),
        )
    )


def duck_repetition_exprs() -> dict:
    # DuckDB's greatest() IGNORES nulls, so the n-gram range over a null
    # text yields [] (len 0) where Spark propagates null — guard each
    # expression explicitly to match Spark's null semantics
    w1 = _duck_ngrams(1)
    w2 = _duck_ngrams(2)
    def _ng(e):
        return f"CASE WHEN text IS NULL THEN NULL ELSE ({e}) END"
    return dict(
        n_tokens=_ng(f"len({w1})"),
        n_distinct_tokens=_ng(f"len(list_distinct({w1}))"),
        n_dup_bigrams=_ng(f"len({w2}) - len(list_distinct({w2}))"),
    )
