"""Near-duplicate cluster resolution: connected components over the
candidate-pair graph, as iterative min-label propagation.

The dedup pipeline's last mile: pair finders (minhash / simhash /
winnowing) emit EDGES; deduplication needs per-document CLUSTER ids so
one canonical representative per component survives.  Components are
computed by min-label propagation — every document starts labeled with
its own id, and each round takes the min over its own label and its
neighbors' labels, converging in O(component diameter) rounds.  Near-dup
graphs are shallow (dup groups are cliques-ish), so a handful of rounds
suffices; for adversarial long-chain graphs ``algorithm="star"`` runs
the alternating large-star/small-star edge rewiring (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), which
converges in O(log^2 n) rounds regardless of diameter.

Scale design: one shuffled join + partial/final min-agg per round, both
keyed on doc_id; per-round ``localCheckpoint`` truncates the iterative
plan (lineage growth is the classic iterative-Spark failure mode — see
CLAUDE.md); convergence is detected from the round's OWN aggregate (the
label sum strictly decreases until fixpoint), so no extra comparison
join.  The driver holds one scalar per round, never rows.

The whole thing remains ORACLE-CHECKABLE: DuckDB's recursive CTE
computes the transitive closure of the same edge set and takes the same
per-source min (duck_dedup_clusters_sql) — value-hash-identical output,
so even this iterative operator is not a rows-only check.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from geojson_vt_rs_spark.operators.text_dedup import (
    duck_minhash_pairs_sql,
    minhash_band_pairs,
)

# minimum estimated Jaccard (minhash agreement fraction) for an edge:
# band collisions below this are chance matches, not duplicates
EDGE_MIN_SIM = 0.5


def default_edges(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b) near-dup edges: LSH candidate pairs filtered to
    confident similarity.  Any pair source with the same two columns
    works (winnow_pairs, simhash_near_pairs)."""
    return minhash_band_pairs(docs).filter(
        F.col("est_sim") >= EDGE_MIN_SIM
    ).select("doc_a", "doc_b")


def _canon_edges(e: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (u < v) form, self-loops dropped."""
    return (
        e.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Kiveris et al. SoCC'14 §3 large-star: every node connects its
    STRICTLY LARGER neighbors to the minimum of its closed neighborhood.
    Connectivity-preserving; shrinks long chains geometrically."""
    d = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        d.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return _canon_edges(
        d.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star: every node connects its smaller neighbors (and itself)
    to the minimum of those neighbors — flattens the stars large-star
    builds."""
    d = e.select(F.col("v").alias("u"), F.col("u").alias("v"))  # u > v
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    return _canon_edges(
        d.join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(m.select("u", F.col("m").alias("v")))
    )


def _star_labels(
    docs: DataFrame, edges: DataFrame, max_rounds: int
) -> DataFrame:
    """Alternating large-star/small-star rounds to the star fixpoint
    (every node directly adjacent to its component minimum), then one
    join derives the labels.  O(log^2 n) rounds worst-case vs plain
    propagation's O(diameter) — the scale path for chain-shaped near-dup
    graphs (drifting boilerplate).  Each round: 2 grouped mins + 2 joins
    + a distinct, all keyed shuffles; per-round localCheckpoint truncates
    the iterative lineage; the driver holds one (count, sum) pair."""
    e = _canon_edges(
        edges.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    ).localCheckpoint(eager=False)
    prev = None
    prev_e = None
    converged = False
    for _ in range(max_rounds):
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        stat = e.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("u") + F.col("v")).alias("s"),
        ).collect()[0]
        sig = (stat["c"], stat["s"])
        if sig == prev:
            # the (count, sum) signature is NOT collision-free for star
            # rounds (distinct edge sets can match on both; unlike label
            # propagation there is no per-round monotonicity to lean on)
            # — confirm the fixpoint EXACTLY before declaring it.  Edge
            # sets are distinct (_canon_edges), so equal counts + empty
            # difference <=> equal sets; the extra job runs only on a
            # signature match (once per converged call).  (ADVICE r4)
            if e.exceptAll(prev_e).isEmpty():
                converged = True
                break  # edge set is a fixpoint of both stars
        prev = sig
        prev_e = e
    if not converged:
        raise RuntimeError(
            f"star rounds did not converge within {max_rounds} rounds"
        )
    # at the fixpoint each non-minimum node has an edge to its component
    # minimum; the minimum's own neighbors are all larger
    d = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nmin = d.groupBy("u").agg(F.min("v").alias("mn"))
    return docs.select("doc_id").join(
        nmin, docs["doc_id"] == nmin["u"], "left"
    ).select(
        "doc_id",
        F.least(
            F.coalesce(F.col("mn"), F.col("doc_id")), F.col("doc_id")
        ).alias("cluster_id"),
    )


def dedup_clusters(
    docs: DataFrame,
    edges: Optional[DataFrame] = None,
    max_rounds: int = 50,
    algorithm: str = "label",
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document; cluster_id is the minimum
    doc_id of the document's connected component (singletons map to
    themselves).  Deterministic for a given edge set.

    ``algorithm="label"`` (default) is plain min-label propagation —
    O(component diameter) rounds, ideal for the clique-ish graphs real
    dup groups form and byte-identical to the DuckDB recursive-CTE
    oracle.  ``algorithm="star"`` runs alternating large-star/small-star
    rewiring (Kiveris et al., SoCC'14) — O(log^2 n) rounds, the scale
    path for adversarial long-chain graphs.  Both produce identical
    labels (asserted by tests on chain + clique corpora)."""
    if edges is None:
        edges = default_edges(docs)
    if algorithm == "star":
        return _star_labels(docs, edges, max_rounds)
    if algorithm != "label":
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    und = edges.union(
        edges.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).persist()
    labels = docs.select(
        F.col("doc_id"), F.col("doc_id").alias("cluster_id")
    ).localCheckpoint(eager=False)
    prev_sum = None
    converged = False
    for _ in range(max_rounds):
        # neighbor labels flow along edges; min with own label
        msgs = und.join(
            labels, und.doc_a == labels.doc_id, "inner"
        ).select(F.col("doc_b").alias("doc_id"), "cluster_id")
        upd = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=False)  # truncate iterative lineage
        )
        s = upd.agg(F.sum("cluster_id").alias("s")).collect()[0]["s"]
        labels = upd
        if s == prev_sum:
            converged = True
            break  # fixpoint: label sum is strictly decreasing until done
        prev_sum = s
    und.unpersist()
    if not converged:
        # silently returning partial labels would make downstream
        # canonical selection quietly wrong on long-chain graphs
        raise RuntimeError(
            f"dedup_clusters did not reach a fixpoint within {max_rounds} "
            "rounds (component diameter exceeds max_rounds); raise "
            "max_rounds or pre-contract chains"
        )
    return labels


def dedup_canonical(docs: DataFrame, edges: Optional[DataFrame] = None) -> DataFrame:
    """The kept set after near-dup resolution: one row per cluster —
    (cluster_id, n_docs); the canonical document is the one whose
    doc_id == cluster_id."""
    cl = dedup_clusters(docs, edges)
    return cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def _duck_edges_sql() -> str:
    return (
        f"SELECT doc_a, doc_b FROM ({duck_minhash_pairs_sql()}) "
        f"WHERE est_sim >= {EDGE_MIN_SIM}"
    )


def duck_dedup_clusters_sql() -> str:
    """Recursive-CTE twin: transitive closure of the same undirected edge
    set seeded with (doc, doc), then min reachable id per source — equal
    to min-label propagation's fixpoint by definition of connectivity."""
    return (
        "WITH RECURSIVE und AS ("
        f"SELECT doc_a AS a, doc_b AS b FROM ({_duck_edges_sql()}) "
        f"UNION ALL SELECT doc_b, doc_a FROM ({_duck_edges_sql()})), "
        "reach(s, t) AS ("
        "SELECT doc_id, doc_id FROM documents "
        "UNION "
        "SELECT r.s, u.b FROM reach r JOIN und u ON u.a = r.t) "
        "SELECT s AS doc_id, CAST(min(t) AS BIGINT) AS cluster_id "
        "FROM reach GROUP BY 1"
    )


def duck_dedup_canonical_sql() -> str:
    return (
        f"WITH cl AS ({duck_dedup_clusters_sql()}) "
        "SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM cl GROUP BY 1"
    )
