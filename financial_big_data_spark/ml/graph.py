"""Distributed graph operators: label propagation & connected components.

The driver-side Louvain/DBSCAN in ml.clustering is right for ≤1e4 nodes (one
node per *series*, tiny by construction). These are the documented scale
paths implemented as pure DataFrame iterations — no GraphFrames dependency:

- **label_propagation**: synchronous LPA — each node adopts the most common
  label among its neighbors; k rounds of (join edges ↔ labels → count →
  argmax). Every round is two co-partitioned shuffles on node id; state is
  one row per node. Community structure ≈ Louvain's for well-separated
  graphs (modularity-optimal splits differ on ambiguous nodes).
- **connected_components**: iterative min-label flooding (each node takes
  the min component id in its neighborhood) — the DBSCAN ε-graph labeller
  at scale. Converges in O(graph diameter) rounds.

Both checkpoint state per round via localCheckpoint() to cut the growing
lineage (iterative DataFrame plans otherwise recompute from the source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _undirected(edges: DataFrame) -> DataFrame:
    fwd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rev = edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    return fwd.unionByName(rev).distinct()


def label_propagation(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """Synchronous LPA over an (src, dst[, weight]) edge DataFrame.

    Returns (node, community). Deterministic: ties break on the smallest
    label, and every node starts labeled by its own id.
    """
    adj = _undirected(edges).cache()
    labels = adj.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    for _ in range(max_iter):
        neigh = (
            adj.join(labels, adj.b == labels.node)
            .groupBy(F.col("a").alias("node"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("node").orderBy(F.desc("n"), "label")
        new_labels = (
            neigh.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") == 1)
            .select("node", "label")
        )
        changed = (
            labels.alias("old")
            .join(new_labels.alias("new"), on="node")
            .where(F.col("old.label") != F.col("new.label"))
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)
        if changed == 0:
            break
    adj.unpersist()
    return labels.withColumnRenamed("label", "community")


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Min-label flooding connected components over (src, dst) edges.

    Returns (node, component) where component is the smallest node id in the
    component — the ε-graph labelling step of distributed DBSCAN.
    """
    adj = _undirected(edges).cache()
    comp = adj.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iter):
        neigh_min = (
            adj.join(comp, adj.b == comp.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("neigh_component"))
        )
        new_comp = (
            comp.join(neigh_min, on="node", how="left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("neigh_component"), F.col("component"))
                ).alias("component"),
            )
        )
        changed = (
            comp.alias("old")
            .join(new_comp.alias("new"), on="node")
            .where(F.col("old.component") != F.col("new.component"))
            .count()
        )
        comp = new_comp.localCheckpoint(eager=True)
        if changed == 0:
            break
    adj.unpersist()
    return comp
