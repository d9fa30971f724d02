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


def modularity(
    edges: DataFrame, communities: DataFrame, weight: str | None = None
) -> float:
    """Newman modularity of a partition, computed as DataFrame aggregates —
    the reference's headline community metric (market_analysis.py:321,
    ``nx.algorithms.community.modularity``) for partitions too large to
    collect.

    Q = Σ_c [ W_in(c)/m − (S(c)/2m)² ] over an undirected weighted graph:
    m = total edge weight, W_in(c) = intra-community edge weight, S(c) =
    summed weighted degree of c's nodes. Three bounded aggregates (one
    over edges, one over degrees, one over communities) — no collect of
    anything node- or edge-sized; only the final scalars reach the driver.

    ``edges``: (src, dst[, weight]) with each undirected edge listed once
    and no self-loops; ``communities``: (node, community), e.g. LPA output.
    Edges with an endpoint missing from ``communities`` are excluded
    consistently from both m and the degree sums.
    """
    w = (F.col(weight).cast("double") if weight else F.lit(1.0)).alias("_w")
    e = edges.select(F.col("src"), F.col("dst"), w)
    c = communities.select("node", "community")
    lab = (
        e.join(
            c.select(F.col("node").alias("src"), F.col("community").alias("_ca")),
            on="src",
        ).join(
            c.select(F.col("node").alias("dst"), F.col("community").alias("_cb")),
            on="dst",
        )
    ).cache()
    totals = lab.agg(
        F.sum("_w").alias("m"),
        F.sum(F.when(F.col("_ca") == F.col("_cb"), F.col("_w")).otherwise(0.0)).alias(
            "w_in"
        ),
    ).collect()[0]
    m = totals.m
    if not m:
        lab.unpersist()
        return 0.0
    deg = (
        lab.select(F.col("_ca").alias("community"), F.col("_w"))
        .unionByName(lab.select(F.col("_cb").alias("community"), F.col("_w")))
        .groupBy("community")
        .agg(F.sum("_w").alias("s"))
    )
    expected = deg.agg(
        F.sum(F.pow(F.col("s") / F.lit(2.0 * m), F.lit(2.0)))
    ).collect()[0][0]
    lab.unpersist()
    return float(totals.w_in / m - expected)


def lpa_communities_df(edges: DataFrame, max_iter: int = 10) -> tuple[DataFrame, dict]:
    """M2 scale path with the driver path's exact contract: LPA communities
    plus {modularity, n_communities} — so callers get the reference's
    headline metric whether the graph fits on the driver (networkx Louvain,
    ml/clustering.louvain_communities_df) or not (this path; everything is
    DataFrame joins/aggregates).

    ``edges``: (src, dst[, weight]); weight is used by the modularity
    metric (LPA itself is unweighted here).
    """
    comms = label_propagation(edges, max_iter=max_iter)
    weight = "weight" if "weight" in edges.columns else None
    # |weight|, matching the driver path (clustering.louvain_communities_df
    # feeds networkx abs(weight)): corr_edges keeps |corr| > θ, so strongly
    # NEGATIVE correlations are legitimate edges — signed weights would
    # shrink m (and can flip Q's sign) for anti-correlated communities
    # (ADVICE r3 medium).
    e = edges.withColumn(weight, F.abs(F.col(weight))) if weight else edges
    q = modularity(e, comms, weight=weight)
    n = comms.select("community").distinct().count()
    return comms, {"modularity": q, "n_communities": n}


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
