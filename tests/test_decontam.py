"""Decontamination invariants (operators/decontam.py): n-gram expr
exactness vs a naive Python twin (incl. null/short/messy-whitespace
docs), anti-join completeness, and broadcast-vs-shuffle equivalence."""

import re
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from geojson_vt_rs_spark.operators.decontam import (
    EVAL_CUT,
    _spark_ngrams,
    contaminated_doc_ids,
    decontaminate,
)
from geojson_vt_rs_spark.operators.sampling import hash_bucket

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _naive_ngrams(text, n=5):
    if text is None:
        return None
    # ASCII-\s only, matching Java/RE2 semantics (Python \s is Unicode)
    ws = [w for w in re.split(r"[ \t\n\x0b\f\r]+", text.strip()) if w]
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def test_ngram_expr_matches_naive(spark):
    rows = [
        (0, "a b c d e f g"),
        (1, "one two three four five"),  # exactly n
        (2, "too short here"),  # < n words
        (3, None),
        (4, "  x\t y  z w v u  "),  # messy ASCII whitespace
        (5, ""),
        (6, "nb sp one two three four five six"),  # U+00A0 is NOT
        # a token break (Java/RE2 ASCII \s semantics, CLAUDE.md)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["g"]
        for r in df.select(
            "doc_id", F.expr(_spark_ngrams(5)).alias("g")
        ).collect()
    }
    for doc_id, text in rows:
        assert got[doc_id] == _naive_ngrams(text), (doc_id, got[doc_id])
    assert got[6][0] == "nb sp one two three four"


def test_decontaminate_removes_exactly_the_flagged(spark):
    docs = _docs(spark).select("doc_id", "text")
    bad = {r["doc_id"] for r in contaminated_doc_ids(docs).collect()}
    assert bad  # corpus near-dups guarantee non-empty at EVAL_CUT=1000
    train = {
        r["doc_id"]
        for r in docs.filter(
            hash_bucket(F.col("doc_id"), "decon-v1") >= EVAL_CUT
        ).collect()
    }
    assert bad < train  # flagged ids are train ids, and not all of them
    clean = {r["doc_id"] for r in decontaminate(docs).collect()}
    assert clean == train - bad


def test_broadcast_and_shuffle_semi_join_agree(spark):
    docs = _docs(spark).select("doc_id", "text")
    a = sorted(
        r["doc_id"]
        for r in contaminated_doc_ids(docs, broadcast_eval=True).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in contaminated_doc_ids(docs, broadcast_eval=False).collect()
    )
    assert a == b and a
