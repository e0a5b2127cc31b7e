"""Eval-set decontamination: flag (and drop) training documents that
share any word n-gram with a held-out evaluation set.

The standard pre-training hygiene step: before a corpus ships, every
document that overlaps the eval/benchmark suite by an exact n-gram must
leave the training split, or downstream eval numbers are contaminated.
Here the eval set is itself a deterministic hash holdout of the corpus
(the same md5-bucket idiom as operators/sampling.py — reproducible at
any parallelism, on any engine), so the whole operator is a pure
function of (seed, n, eval_cut) with a DuckDB SQL twin.

Scale shape (the part that matters at 100 TB):

* n-grams are built with a chain of ``zip_with(W, slice(W, k, size(W)))``
  steps — top-level whole-array slices, element lambdas that touch only
  their two arguments.  Per the repo's Catalyst rules (CLAUDE.md), a
  ``slice(W, i, n)`` INSIDE a per-element lambda would re-evaluate the
  whole tokenize expression per element (O(len^2) per doc); the zip_with
  chain evaluates the word split once per row and stays JVM codegen.
* the eval side is small by construction (``eval_cut``/10000 of the
  corpus); its distinct gram set broadcasts, so the training side is
  scanned ONCE, map-side only: explode -> broadcast LEFT SEMI join ->
  partial-agg distinct.  No shuffle of the big side at all.  If the
  eval suite ever outgrows the broadcast ceiling, pass
  ``broadcast_eval=False`` and the same plan becomes a shuffled semi
  join on the (hash-uniform) gram key.
* documents with fewer than ``n`` words contribute no grams (the
  conventional decontamination semantics); null texts likewise.

No reference counterpart (maxammann/geojson-vt-rs is a vector-tile
engine); this sits beside text_dedup/sampling as the graft's
training-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sampling import N_BUCKETS, duck_hash_bucket, hash_bucket
from .text_dedup import _duck_words, _spark_words

N_GRAM = 5
EVAL_CUT = 1_000  # 10% of N_BUCKETS


def _spark_ngrams(n: int = N_GRAM) -> str:
    """Array of space-joined word ``n``-grams as ONE SQL expression.

    ``zip_with`` pads the shorter array with nulls and ``concat``
    propagates them, so exactly the ``size(W)-n+1`` full-length grams
    survive the final not-null filter — byte-identical to DuckDB's
    ``list_transform(range(1, len(W)-n+2), i -> array_to_string(
    list_slice(W, i, i+n-1), ' '))`` (:func:`_duck_ngrams`).

    The word split binds ONCE per row as a lambda variable
    (``transform(array(words), W -> ...)[0]`` — a let-binding), so the
    2(n-1)+1 references to ``W`` in the chain never re-tokenize the
    document.
    """
    w = _spark_words()
    chain = "W"
    for k in range(2, n + 1):
        chain = (
            f"zip_with({chain}, slice(W, {k}, size(W)), "
            "(a, b) -> concat(a, ' ', b))"
        )
    return (
        f"transform(array({w}), W -> "
        f"filter({chain}, g -> g IS NOT NULL))[0]"
    )


def _duck_ngrams(n: int = N_GRAM) -> str:
    w = _duck_words()
    return (
        f"list_transform(range(1, greatest(len({w})-{n}+1, 0)+1), "
        f"i -> array_to_string(list_slice({w}, i, i+{n}-1), ' '))"
    )


def _gram_rows(
    docs: DataFrame, n: int, seed: str, key_col: str
) -> DataFrame:
    """(key, bucket, gram) rows — explode_outer + not-null filter so the
    generator is NOT pushed below exchanges as an inferred size()>0
    scan filter (Catalyst rule in CLAUDE.md)."""
    return (
        docs.select(
            F.col(key_col),
            hash_bucket(F.col(key_col), seed).alias("_b"),
            F.explode_outer(F.expr(_spark_ngrams(n))).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
    )


def contaminated_doc_ids(
    docs: DataFrame,
    n: int = N_GRAM,
    seed: str = "decon-v1",
    eval_cut: int = EVAL_CUT,
    key_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """Distinct keys of TRAIN documents (bucket >= ``eval_cut``) that
    share at least one word ``n``-gram with any EVAL document (bucket <
    ``eval_cut``)."""
    grams = _gram_rows(docs, n, seed, key_col)
    eval_grams = (
        grams.filter(F.col("_b") < eval_cut).select("gram").distinct()
    )
    if broadcast_eval:
        eval_grams = F.broadcast(eval_grams)
    return (
        grams.filter(F.col("_b") >= eval_cut)
        .join(eval_grams, "gram", "left_semi")
        .select(key_col)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    n: int = N_GRAM,
    seed: str = "decon-v1",
    eval_cut: int = EVAL_CUT,
    key_col: str = "doc_id",
    broadcast_eval: bool = True,
) -> DataFrame:
    """The production op: TRAIN documents with every eval-overlapping
    document removed (LEFT ANTI against the bounded contaminated-id
    set, which broadcasts)."""
    bad = contaminated_doc_ids(
        docs, n, seed, eval_cut, key_col, broadcast_eval
    )
    train = docs.filter(
        hash_bucket(F.col(key_col), seed) >= eval_cut
    )
    return train.join(F.broadcast(bad), key_col, "left_anti")


def duck_decontam_ctes(
    n: int = N_GRAM,
    seed: str = "decon-v1",
    eval_cut: int = EVAL_CUT,
    table: str = "documents",
) -> str:
    """Shared CTE prefix (``w``/``g``/``e``/``c``) for oracle twins:
    ``c`` is the contaminated train doc_id set."""
    b = duck_hash_bucket("doc_id", seed)
    return (
        f"w AS (SELECT doc_id, lang, {b} AS b FROM {table}), "
        f"g AS (SELECT doc_id, {b} AS b, unnest({_duck_ngrams(n)}) AS gram "
        f"FROM {table} WHERE text IS NOT NULL), "
        f"e AS (SELECT DISTINCT gram FROM g WHERE b < {eval_cut}), "
        f"c AS (SELECT DISTINCT doc_id FROM g WHERE b >= {eval_cut} "
        "AND gram IN (SELECT gram FROM e))"
    )


# ------------------------------------------------- duplicate-span stats
# Exact substring-level duplication (the signal behind Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better",
# arXiv:2107.06499): a K-token gram is a DUP SPAN iff it occurs in >= 2
# distinct documents.  A true suffix-array pass is inherently
# sequential; the distributed-exact formulation is per-position K-gram
# membership, which upper-bounds every duplicated substring of length
# >= K (any such substring contains a shared K-gram at each offset).

DUP_SPAN_K = 8


def dup_span_stats(
    docs: DataFrame,
    k: int = DUP_SPAN_K,
    key_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-span profile: (doc_id, n_grams,
    n_dup_grams, dup_permille).

    ``n_dup_grams`` counts gram POSITIONS whose k-token gram appears in
    at least 2 distinct documents (self-repeats within one doc do not
    count as duplication); ``dup_permille`` is the exact integer ratio
    ``1000*n_dup_grams div n_grams``.  Docs with fewer than ``k`` words
    contribute no rows.

    Scale shape: grams are hashed to one BIGINT each (md5-derived, the
    repo idiom) before any shuffle, so the wide text never leaves the
    scan stage; the dup-gram set comes from a partial-agg
    count-distinct on the gram hash, and the membership join is a
    shuffled equi-join on that uniformly-distributed hash — no
    broadcast assumption (the dup set is corpus-sized in the worst
    case), no all-pairs join anywhere.
    """
    grams = (
        docs.select(
            F.col(key_col),
            F.explode_outer(F.expr(_spark_ngrams(k))).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
        .select(
            key_col,
            F.expr(
                "cast(conv(substring(md5(gram), 1, 15), 16, 10) as bigint)"
            ).alias("gh"),
        )
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct(key_col).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    per_doc = grams.groupBy(key_col).agg(F.count("*").alias("n_grams"))
    dup_doc = (
        grams.join(dup, "gh")
        .groupBy(key_col)
        .agg(F.count("*").alias("n_dup_grams"))
    )
    return (
        per_doc.join(dup_doc, key_col, "left")
        .select(
            key_col,
            "n_grams",
            F.coalesce(F.col("n_dup_grams"), F.lit(0).cast("long")).alias(
                "n_dup_grams"
            ),
        )
        .withColumn(
            "dup_permille", F.expr("(1000L * n_dup_grams) div n_grams")
        )
    )


def duck_dup_span_sql(
    k: int = DUP_SPAN_K,
    table: str = "documents",
) -> str:
    """DuckDB twin of dup_span_stats (same md5 gram hashes, same
    integer permille; every count CAST to BIGINT)."""
    gh = "(('0x' || substr(md5(gram), 1, 15))::BIGINT)"
    return (
        f"WITH g AS (SELECT doc_id, {gh} AS gh FROM ("
        f"SELECT doc_id, unnest({_duck_ngrams(k)}) AS gram FROM {table} "
        "WHERE text IS NOT NULL)), "
        "dup AS (SELECT gh FROM (SELECT gh, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS nd FROM g GROUP BY gh) "
        "WHERE nd >= 2), "
        "pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams "
        "FROM g GROUP BY doc_id), "
        "dd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams "
        "FROM g JOIN dup USING (gh) GROUP BY doc_id) "
        "SELECT pd.doc_id, pd.n_grams, "
        "COALESCE(dd.n_dup_grams, 0) AS n_dup_grams, "
        "(1000 * COALESCE(dd.n_dup_grams, 0)) // pd.n_grams AS dup_permille "
        "FROM pd LEFT JOIN dd ON pd.doc_id = dd.doc_id"
    )


assert N_BUCKETS == 10_000  # duck_hash_bucket inlines the modulus
