"""IVF top-k and embedding near-dup operators (the ANN scale paths)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dups,
    ivf_topk,
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
