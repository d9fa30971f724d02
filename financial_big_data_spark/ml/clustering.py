"""Clustering / decomposition operators (SURVEY §2.9 M1-M5).

MLlib carries K-Means, PCA and silhouette natively. Louvain and DBSCAN have
no MLlib implementation; the reference runs them on ≤100-node symbol graphs
(reference market_analysis.py:310-374), so the engine computes the *inputs*
distributed (correlation matrix → edge list → ε-graph) and runs the tiny
graph algorithms driver-side (networkx). When the node count outgrows the
driver, the implemented scale path is ``ml.graph``: pure-DataFrame
label_propagation (community detection) and connected_components (the
ε-graph labelling step of distributed DBSCAN) over the same edge DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import ClusteringEvaluator
from pyspark.ml.feature import PCA, StandardScaler, VectorAssembler


def _assemble(df: DataFrame, feature_cols: list[str], standardize: bool) -> DataFrame:
    vec = VectorAssembler(inputCols=feature_cols, outputCol="_raw", handleInvalid="skip")
    out = vec.transform(df)
    if standardize:
        # sklearn StandardScaler parity: withMean=True, withStd=True (the
        # population-σ divergence only shifts scale uniformly — cluster
        # assignments are invariant; exact ddof handled in functions.stats)
        scaler = StandardScaler(inputCol="_raw", outputCol="_features", withMean=True, withStd=True)
        return scaler.fit(out).transform(out).drop("_raw")
    return out.withColumnRenamed("_raw", "_features")


def kmeans_clusters(
    df: DataFrame,
    feature_cols: list[str],
    k: int = 5,
    seed: int = 42,
    standardize: bool = True,
) -> tuple[DataFrame, dict]:
    """M1: K-Means(k, seed) → (assignments DataFrame, quality metrics).

    Reference clustering.py:24-56 (k=5, seed=42, silhouette + inertia).
    """
    assembled = _assemble(df, feature_cols, standardize).cache()
    model = KMeans(k=k, seed=seed, featuresCol="_features", predictionCol="cluster").fit(assembled)
    assigned = model.transform(assembled)
    silhouette = ClusteringEvaluator(
        featuresCol="_features", predictionCol="cluster", metricName="silhouette"
    ).evaluate(assigned)
    metrics = {"silhouette": silhouette, "inertia": model.summary.trainingCost, "k": k}
    return assigned.drop("_features"), metrics


def pca_project(
    df: DataFrame, feature_cols: list[str], k: int = 3, standardize: bool = True
) -> DataFrame:
    """M5: PCA(k) projection appended as pc array column."""
    from pyspark.ml.functions import vector_to_array

    assembled = _assemble(df, feature_cols, standardize)
    model = PCA(k=k, inputCol="_features", outputCol="_pc").fit(assembled)
    out = model.transform(assembled)
    return out.withColumn("pc", vector_to_array("_pc")).drop("_features", "_pc")


def correlation_matrix(
    df: DataFrame, key: str, time: str, value: str
) -> DataFrame:
    """A8/J6: key×key Pearson correlation via relational self-join.

    Input: long-form (key, time, value). The join is on ``time`` (both sides
    sorted/partitioned the same way → co-partitioned sort-merge join), and the
    per-pair corr is a single hash aggregate. For k keys the output is
    k(k-1)/2 rows — tiny relative to the fact data, safe to collect/broadcast.
    """
    a, b = df.alias("a"), df.alias("b")
    return (
        a.join(b, on=time)
        .where(F.col(f"a.{key}") < F.col(f"b.{key}"))
        .groupBy(F.col(f"a.{key}").alias("key_a"), F.col(f"b.{key}").alias("key_b"))
        .agg(F.corr(f"a.{value}", f"b.{value}").alias("corr"), F.count(F.lit(1)).alias("n"))
    )


def corr_edges(corr: DataFrame, threshold: float = 0.3) -> DataFrame:
    """M2 input: |corr| > θ edge list (reference market_analysis.py:310-318
    builds this with an O(k²) Python double loop; here it's a filter)."""
    return corr.where(F.abs(F.col("corr")) > threshold).select(
        F.col("key_a").alias("src"), F.col("key_b").alias("dst"), F.col("corr").alias("weight")
    )


def louvain_communities_df(
    spark: SparkSession, edges: DataFrame, seed: int = 42
) -> tuple[DataFrame, dict]:
    """M2: Louvain on the collected edge list (driver-side networkx).

    The reference runs python-louvain on ≤100 nodes (market_analysis.py:321);
    the collected edge list here is the same size regardless of fact-data
    scale (one node per series). Scale path for >1e5 nodes: GraphFrames LPA
    on the ``edges`` DataFrame.
    Returns ((node, community) DataFrame, {modularity, n_communities}).
    """
    import networkx as nx
    from networkx.algorithms import community as nxc

    g = nx.Graph()
    for r in edges.collect():
        g.add_edge(r.src, r.dst, weight=abs(float(r.weight)))
    if g.number_of_edges() == 0:
        return spark.createDataFrame([], "node string, community int"), {
            "modularity": 0.0,
            "n_communities": 0,
        }
    comms = nxc.louvain_communities(g, weight="weight", seed=seed)
    mod = nxc.modularity(g, comms, weight="weight")
    rows = [(str(n), i) for i, c in enumerate(comms) for n in c]
    return (
        spark.createDataFrame(rows, "node string, community int"),
        {"modularity": float(mod), "n_communities": len(comms)},
    )


def dbscan(
    df: DataFrame,
    id_col: str,
    feature_cols: list[str],
    eps: float | None = None,
    min_pts: int | None = None,
    eps_percentile: float = 0.9,
) -> tuple[DataFrame, dict]:
    """M3/M4: DBSCAN via ε-graph + connected components of core points.

    Distributed parts: pairwise distances (a self-join — the reference's
    sklearn call is O(n²) on the driver anyway), kNN distance for the eps
    elbow (M4: P90 of 1-NN distances, the reference's KneeLocator fallback,
    market_analysis.py:875-879), core-point filter. The component labelling
    runs driver-side on the ε-edge list (≤ series count nodes); scale path:
    GraphFrames connectedComponents on the same edge DataFrame.
    Returns ((id, cluster, is_noise) DataFrame, params). cluster = -1 → noise.
    """
    import networkx as nx

    n = df.count()
    if min_pts is None:
        import math

        min_pts = max(int(math.log(max(n, 2))), 3)
    vec = F.array(*[F.col(c).cast("double") for c in feature_cols])
    pts = df.select(F.col(id_col).alias("_id"), vec.alias("_v")).cache()
    a = pts.select(F.col("_id").alias("ia"), F.col("_v").alias("va"))
    b = pts.select(F.col("_id").alias("ib"), F.col("_v").alias("vb"))
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("va", "vb", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    pairs = a.join(b, F.col("ia") != F.col("ib")).select("ia", "ib", dist.alias("d")).cache()
    if eps is None:
        knn = pairs.groupBy("ia").agg(F.min("d").alias("nn"))
        eps = float(
            knn.agg(F.expr(f"percentile(nn, {eps_percentile})").alias("p")).collect()[0].p
        )
    neigh = pairs.where(F.col("d") <= eps)
    core = neigh.groupBy("ia").agg(F.count(F.lit(1)).alias("n_neigh")).where(
        F.col("n_neigh") >= min_pts
    )
    core_ids = {r.ia for r in core.collect()}
    g = nx.Graph()
    g.add_nodes_from(core_ids)
    for r in neigh.collect():
        if r.ia in core_ids and r.ib in core_ids:
            g.add_edge(r.ia, r.ib)
    label: dict = {}
    for ci, comp in enumerate(nx.connected_components(g)):
        for node in comp:
            label[node] = ci
    # border points attach to any core neighbor's cluster (deterministic: min)
    border = (
        neigh.where(F.col("ia").isin(list(core_ids)) == False)  # noqa: E712
        .where(F.col("ib").isin(list(core_ids)))
        .groupBy("ia")
        .agg(F.min("ib").alias("via"))
        .collect()
        if core_ids
        else []
    )
    for r in border:
        label[r.ia] = label[r.via]
    all_ids = [r._id for r in pts.select("_id").collect()]
    rows = [(i, int(label.get(i, -1)), i not in label) for i in all_ids]
    out = df.sparkSession.createDataFrame(rows, f"{id_col} string, cluster int, is_noise boolean")
    n_clusters = len({v for v in label.values()})
    return out, {"eps": eps, "min_pts": min_pts, "n_clusters": n_clusters,
                 "n_noise": sum(1 for r in rows if r[2])}
