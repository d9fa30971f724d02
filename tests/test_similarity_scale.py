"""IVF top-k and embedding near-dup operators (the ANN scale paths)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dups,
    ivf_topk,
    random_plane_bands,
)


@pytest.fixture(scope="module")
def clustered_emb(spark):
    """128 vectors in 4 tight clusters + planted near-dup pairs."""
    rng = np.random.default_rng(42)
    centers = rng.normal(0, 5, (4, 16))
    rows = []
    for i in range(128):
        c = centers[i % 4]
        v = c + rng.normal(0, 0.3, 16)
        rows.append((i, [float(x) for x in v]))
    # plant exact near-dups: 100↔101, 102↔103
    rows[101] = (101, [x * 1.0001 for x in rows[100][1]])
    rows[103] = (103, [x * 1.0002 for x in rows[102][1]])
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ivf_topk_recall_vs_brute_force(spark, clustered_emb):
    q = clustered_emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(clustered_emb, q, k=5)
    approx = ivf_topk(clustered_emb, q, n_cells=4, n_probe=2, k=5)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx.collect():
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    # same-cluster neighbors live in the probed cells → high recall
    for qid, exp in exact_sets.items():
        got = approx_sets.get(qid, set())
        recall = len(exp & got) / len(exp)
        assert recall >= 0.8, (qid, exp, got)


def test_embedding_near_dups_exact(spark, clustered_emb):
    pairs = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dups(clustered_emb, threshold=0.9999).collect()
    }
    assert (100, 101) in pairs and (102, 103) in pairs
    assert all(v >= 0.9999 for v in pairs.values())


def test_embedding_near_dups_lsh_bucketed(spark, clustered_emb):
    rng = np.random.default_rng(0)
    planes = rng.normal(0, 1, (6, 16)).tolist()
    pairs = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(clustered_emb, threshold=0.9999, planes=planes).collect()
    }
    # identical-direction vectors share every hyperplane side → same bucket
    assert (100, 101) in pairs and (102, 103) in pairs


@pytest.fixture(scope="module")
def noisy_dup_emb(spark):
    """200 random unit vectors + 60 planted near-dup partners at cosine
    ≈0.95-0.99 — pairs sit close to hyperplane boundaries, so single-band
    LSH measurably loses them (the OR-amplification failure mode)."""
    rng = np.random.default_rng(123)
    rows = []
    for i in range(200):
        v = rng.normal(0, 1, 16)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
    for j in range(60):
        base = np.asarray(rows[j][1])
        noise = rng.normal(0, 1, 16)
        noise -= noise.dot(base) * base  # orthogonal perturbation
        noise /= np.linalg.norm(noise)
        theta = 0.15 + 0.15 * (j / 60.0)  # cosine in [cos .30, cos .15]
        dup = np.cos(theta) * base + np.sin(theta) * noise
        rows.append((1000 + j, [float(x) for x in dup]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_near_dups_or_amplification(spark, noisy_dup_emb):
    """b independent bands must recover ≥0.9 of the exact near-dup pairs
    where a single band measurably drops them (VERDICT r2 wrong #5):
    recall goes 1-(1-p^bits)^b instead of p^bits."""
    threshold = 0.95
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(noisy_dup_emb, threshold=threshold).collect()
    }
    assert len(exact) >= 30  # the planted pairs are really there

    single = random_plane_bands(1, 6, 16, seed=7)[0]
    got_single = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(
            noisy_dup_emb, threshold=threshold, planes=single
        ).collect()
    }
    banded = random_plane_bands(8, 6, 16, seed=7)
    got_banded = {
        (r.id_a, r.id_b)
        for r in embedding_near_dups(
            noisy_dup_emb, threshold=threshold, planes=banded
        ).collect()
    }
    recall_single = len(got_single & exact) / len(exact)
    recall_banded = len(got_banded & exact) / len(exact)
    assert recall_single <= 0.85  # single band demonstrably loses pairs
    assert recall_banded >= 0.9, (recall_single, recall_banded)
    # LSH candidates are a subset of all pairs → no false positives vs exact
    assert got_banded <= exact


def test_ivf_plan_flat_in_n_cells(spark, clustered_emb):
    """Centroids are DATA (broadcast join), not plan literals: the analyzed
    plan must not grow with n_cells (VERDICT r2 wrong #4)."""
    q = clustered_emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plans = {}
    for n_cells in (4, 32):
        df = ivf_topk(clustered_emb, q, n_cells=n_cells, n_probe=2, k=3)
        plans[n_cells] = len(df._jdf.queryExecution().analyzed().toString())
    # allow small jitter (cell-count digits etc.), not O(n_cells·dim) growth
    assert plans[32] < plans[4] * 1.2, plans
