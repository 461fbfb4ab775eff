"""Duplicate-cluster resolution: connected components over the near-dup
pair graph, by iterative min-label propagation.

Real dedup pipelines need this step after pair detection: pairs (a,b),
(b,c) must collapse to ONE canonical document for {a,b,c}. Spark has no
recursive SQL, so we iterate ``label <- min(label over neighbors+self)``
with DataFrame joins until fixpoint — the standard large-scale formation
(HashToMin / large-star style); each iteration is one shuffle on the
vertex id and the diameter of near-dup clusters is tiny (pairs are
transitively similar), so convergence is 2-3 rounds in practice. The
DuckDB oracle computes the same fixpoint with a recursive CTE — label
propagation converges to min-reachable-id, which is exactly what the
recursion computes, so results hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """``edges``: (src, dst) undirected. Returns (node, component) with
    component = min node id reachable. Iterates until no label changes.

    Scale/efficiency notes (this loop runs ONE action per iteration):

    - The edge list is persisted up front: without the cache every
      iteration's action would re-execute the whole upstream
      pair-detection pipeline (minhash, band join, Jaccard verify).
    - Convergence is detected WITHOUT a join: labels only ever decrease
      under min-propagation, so ``sum(component)`` is strictly
      decreasing until fixpoint; comparing successive sums is an O(V)
      map-side aggregate folded into the same action that materializes
      the new generation. (Decimal sum — exact at any node count, no
      bigint overflow at 100 TB id ranges.)
    - Old label generations are unpersisted as soon as the next one is
      materialized, so memory held is O(V + E) regardless of rounds."""
    sym = (
        edges.selectExpr("src", "dst")
        .union(edges.selectExpr("dst AS src", "src AS dst"))
        .persist()
    )
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).persist()
    prev_sum = None

    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        cur_sum = new_labels.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    sym.unpersist()
    return labels


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: minhash-LSH near-dup pairs -> connected components ->
    (doc, canonical keeper). Only documents that belong to some cluster
    appear (singletons keep themselves trivially)."""
    from .dedup_fuzzy import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), F.col("component").alias("canonical_doc_id")
    )


# The oracle recomputes the same pair graph (the minhash_lsh_pairs SQL),
# then min-reachable-id per node via recursive CTE.
def _dedup_clusters_sql() -> str:
    from .dedup_fuzzy import MINHASH_LSH_PAIRS_SQL

    return f"""
WITH RECURSIVE pairs AS (
  {MINHASH_LSH_PAIRS_SQL.replace('SELECT doc_a, doc_b,', 'SELECT doc_a, doc_b,').strip()}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
), reach(node, target) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.target
  FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS doc_id, MIN(target) AS canonical_doc_id
FROM reach GROUP BY node
"""


EXT_QUERIES = {
    "dedup_clusters": (dedup_clusters, _dedup_clusters_sql()),
}
