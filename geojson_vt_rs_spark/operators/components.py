"""Near-duplicate cluster resolution: connected components over the
candidate-pair graph, as iterative min-label propagation.

The dedup pipeline's last mile: pair finders (minhash / simhash /
winnowing) emit EDGES; deduplication needs per-document CLUSTER ids so
one canonical representative per component survives.  Components are
computed by min-label propagation — every document starts labeled with
its own id, and each round takes the min over its own label and its
neighbors' labels, converging in O(component diameter) rounds.  Near-dup
graphs are shallow (dup groups are cliques-ish), so a handful of rounds
suffices; for adversarial long-chain graphs the same loop accepts the
large-star/small-star edge rewiring (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) which bounds rounds at
O(log n) — the loop structure below is unchanged.

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


def dedup_clusters(
    docs: DataFrame,
    edges: Optional[DataFrame] = None,
    max_rounds: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document; cluster_id is the minimum
    doc_id of the document's connected component (singletons map to
    themselves).  Deterministic for a given edge set."""
    if edges is None:
        edges = default_edges(docs)
    und = edges.union(
        edges.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).persist()
    labels = docs.select(
        F.col("doc_id"), F.col("doc_id").alias("cluster_id")
    ).localCheckpoint(eager=False)
    prev_sum = None
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
            break  # fixpoint: label sum is strictly decreasing until done
        prev_sum = s
    und.unpersist()
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
