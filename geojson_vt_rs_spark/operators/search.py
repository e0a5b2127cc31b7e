"""BM25 keyword search top-k over the documents table, exactly
cross-engine reproducible.

Training-data curation needs keyword retrieval (targeted quality audits,
eval-set mining, topic probes); the reference repo has no counterpart —
this is a training-pipeline extension beside operators/importance.py.

Exactness contract:

* Tokenization is the pinned ASCII-whitespace word splitter
  (text_dedup._spark_words / _duck_words) — the ONE point of change for
  every word-tokenizing oracle in this repo.
* Query terms are derived from the corpus itself (top document-frequency,
  ties broken lexicographically), so the operator is sf-independent and
  the oracle re-derives them in SQL.
* idf wears the repo's transcendental convention: ``round(ln(...), 6)``
  evaluated IN-ENGINE on both sides (same proven bet as the mercator
  cell expressions — never compute a transcendental driver-side where
  libm could differ from the JVM).
* The per-(doc, term) BM25 contribution is floored to fixed-point BIGINT
  (``floor(x * 1e6 + 0.5)``); the per-doc score is then an INTEGER sum —
  aggregation order cannot flip a bit.  The float expression itself is a
  fixed parse tree of IEEE ops over identical double literals, so both
  engines compute the same double before the floor.

Scale shape:

* stats pass: one partial-aggregated count/sum job (two scalars).
* term pass: two-level groupBy (token, doc) -> (token) distinct-df agg —
  partial agg both levels, then orderBy().limit (TakeOrderedAndProject,
  never a global sort); collects n_query_terms rows driver-side.
* scoring pass: explode_outer + generated-col null filter (the Catalyst
  inferred-filter lesson, CLAUDE.md), filter to the inlined term
  literals map-side, groupBy(doc_id, tok) partial agg, CASE-literal idf
  (3 branches, no join), integer per-doc sum, top-k cut.  No window, no
  broadcast needed, three scans total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text_dedup import _duck_words, _spark_words

K1 = "1.2"    # literal text shared by both engines
B_ = "0.75"


def _spark_idf(n_docs: int, df: int) -> str:
    return (
        f"round(ln((CAST({n_docs} AS DOUBLE) - {df} + 0.5D) / "
        f"({df} + 0.5D) + 1.0D), 6)"
    )


def _spark_score(n_docs: int, total_tokens: int, idf_case: str) -> str:
    """floor-to-int6 BM25 contribution; dl*N/T is the exact avgdl ratio
    (integer product cast once), every literal double-typed."""
    return (
        f"CAST(floor(({idf_case}) * (CAST(tf AS DOUBLE) * 2.2D) / "
        f"(CAST(tf AS DOUBLE) + {K1}D * (0.25D + {B_}D * "
        f"(CAST(dl * {n_docs} AS DOUBLE) / CAST({total_tokens} AS DOUBLE))))"
        f" * 1000000.0D + 0.5D) AS BIGINT)"
    )


def corpus_query_terms(
    docs: DataFrame, n_query_terms: int = 3, text_col: str = "text"
) -> list[tuple[str, int]]:
    """Top-df tokens (df DESC, token ASC): [(token, df)].  Two-level
    partial agg, TakeOrderedAndProject cut."""
    words = _spark_words() if text_col == "text" else None
    if words is None:
        raise ValueError("text_col must be 'text' (pinned tokenizer)")
    toks = (
        docs.filter(F.col(text_col).isNotNull())
        .select("doc_id", F.expr(f"explode_outer({words})").alias("tok"))
        .filter(F.col("tok").isNotNull())
    )
    dfs = (
        toks.groupBy("tok", "doc_id").agg(F.lit(1))
        .groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.col("df").desc(), F.col("tok").asc())
        .limit(n_query_terms)
        .collect()
    )
    return [(r["tok"], int(r["df"])) for r in dfs]


def bm25_topk(
    docs: DataFrame,
    k: int = 20,
    n_query_terms: int = 3,
) -> DataFrame:
    """BM25 top-k (k1=1.2, b=0.75) for the corpus-derived query terms:
    (doc_id, score_fp BIGINT, n_terms BIGINT), exactly matching
    duck_bm25_sql."""
    base = docs.filter(F.col("text").isNotNull())
    words = _spark_words()
    # the stats scalar agg and the term-derivation agg are independent
    # Spark actions — run them as concurrent jobs (guide §2.6; one job
    # latency instead of two sequential scans' worth)
    from concurrent.futures import ThreadPoolExecutor

    def _stats():
        return base.select(
            F.count(F.lit(1)), F.sum(F.expr(f"size({words})").cast("long"))
        ).collect()[0]

    with ThreadPoolExecutor(2) as ex:
        f_stats = ex.submit(_stats)
        f_terms = ex.submit(corpus_query_terms, docs, n_query_terms)
        n_docs, total_tokens = f_stats.result()
        terms = f_terms.result()
    n_docs, total_tokens = int(n_docs), int(total_tokens)
    if not terms:
        raise ValueError("corpus has no tokens")

    # term literals go through the Column API (F.lit / isin), never SQL
    # text — corpus tokens may contain quotes/backslashes
    toks = (
        base.select(
            "doc_id",
            F.expr(f"size({words})").cast("long").alias("dl"),
            F.expr(f"explode_outer({words})").alias("tok"),
        )
        .filter(F.col("tok").isNotNull())
        .filter(F.col("tok").isin([t for t, _ in terms]))
    )
    tf = toks.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl")
    )
    idf_case = None
    for t, df in terms:
        cond = F.col("tok") == F.lit(t)
        val = F.expr(_spark_idf(n_docs, df))
        idf_case = (
            F.when(cond, val) if idf_case is None
            else idf_case.when(cond, val)
        )
    scored = tf.withColumn("__idf", idf_case).withColumn(
        "s", F.expr(_spark_score(n_docs, total_tokens, "__idf"))
    ).drop("__idf")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("s").cast("long").alias("score_fp"),
            F.count(F.lit(1)).alias("n_terms"),
        )
        .orderBy(F.col("score_fp").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def duck_bm25_sql(
    k: int = 20,
    n_query_terms: int = 3,
    table: str = "documents",
) -> str:
    """DuckDB twin: re-derives terms / N / T / df / idf in CTEs from the
    same table, byte-identical arithmetic (see module docstring)."""
    w = _duck_words()
    idf = "round(ln((CAST(st.n AS DOUBLE) - t.df + 0.5) / (t.df + 0.5) + 1.0), 6)"
    score = (
        "CAST(floor(i.idf6 * (CAST(tf.tf AS DOUBLE) * 2.2) / "
        "(CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * "
        "(CAST(dl.dl * st.n AS DOUBLE) / CAST(st.t AS DOUBLE)))) "
        "* 1000000.0 + 0.5) AS BIGINT)"
    )
    return (
        f"WITH d AS (SELECT doc_id, {w} AS ws FROM {table} "
        "WHERE text IS NOT NULL), "
        "dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM d), "
        "st AS (SELECT count(*) AS n, CAST(sum(len(ws)) AS BIGINT) AS t "
        "FROM d), "
        "tok AS (SELECT doc_id, unnest(ws) AS tok FROM d), "
        "dfall AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok "
        "GROUP BY tok), "
        f"terms AS (SELECT tok, df FROM dfall ORDER BY df DESC, tok ASC "
        f"LIMIT {n_query_terms}), "
        f"idf AS (SELECT t.tok, {idf} AS idf6 FROM terms t, st), "
        "tf AS (SELECT tok.doc_id, tok.tok, count(*) AS tf FROM tok "
        "JOIN terms USING (tok) GROUP BY 1, 2), "
        f"sc AS (SELECT tf.doc_id, {score} AS s FROM tf "
        "JOIN idf i USING (tok) JOIN dl USING (doc_id) CROSS JOIN st) "
        "SELECT doc_id, CAST(sum(s) AS BIGINT) AS score_fp, "
        "count(*) AS n_terms FROM sc GROUP BY doc_id "
        f"ORDER BY score_fp DESC, doc_id ASC LIMIT {k}"
    )


def python_bm25(
    rows: list[tuple[int, str | None]], k: int = 20, n_query_terms: int = 3
) -> list[tuple[int, int, int]]:
    """Plain-Python reference for tests (independent of both engines).
    NOTE: uses math.log — 1-ulp libm differences from the JVM are
    possible in principle, which is exactly why the ENGINES never
    compute idf driver-side; at round-6 the corpus tests pin equality.
    """
    import math
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    docs = [
        (i, [t for t in ws.split(txt.strip()) if t])
        for i, txt in rows if txt is not None
    ]
    n = len(docs)
    t = sum(len(toks) for _, toks in docs)
    df: dict[str, int] = {}
    for _, toks in docs:
        for tokn in set(toks):
            df[tokn] = df.get(tokn, 0) + 1
    terms = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:n_query_terms]
    out = {}
    for i, toks in docs:
        dl = len(toks)
        s = 0
        hit = 0
        for term, dfv in terms:
            tfv = toks.count(term)
            if not tfv:
                continue
            hit += 1
            idf6 = round(math.log((float(n) - dfv + 0.5) / (dfv + 0.5) + 1.0), 6)
            val = (
                idf6 * (float(tfv) * 2.2)
                / (float(tfv) + 1.2 * (0.25 + 0.75 * (float(dl * n) / float(t))))
            )
            s += math.floor(val * 1000000.0 + 0.5)
        if hit:
            out[i] = (s, hit)
    ranked = sorted(out.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    return [(i, s, h) for i, (s, h) in ranked]
