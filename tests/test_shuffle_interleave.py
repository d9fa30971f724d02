"""Pins for the deterministic ordering operators (operators/sampling.py):
seeded_shuffle (epoch shuffling) and interleave_sources (weighted
training-mix ordering). The DuckDB oracles (doc_shuffle/doc_interleave)
hash-check both against real data; here we pin the permutation, layout
invariance and exact weighted-fair-queueing properties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.sampling import (
    interleave_sources,
    seeded_shuffle,
)


def _docs(spark, n):
    return spark.range(n).select(F.col("id").alias("doc_id"))


def test_seeded_shuffle_is_permutation(spark):
    out = seeded_shuffle(_docs(spark, 100), seed=1)
    positions = sorted(r["shuffle_pos"] for r in out.collect())
    assert positions == list(range(1, 101))


def test_seeded_shuffle_reproducible_and_seed_sensitive(spark):
    docs = _docs(spark, 60)
    a1 = {r["doc_id"]: r["shuffle_pos"] for r in seeded_shuffle(docs, seed=5).collect()}
    a2 = {r["doc_id"]: r["shuffle_pos"] for r in seeded_shuffle(docs, seed=5).collect()}
    b = {r["doc_id"]: r["shuffle_pos"] for r in seeded_shuffle(docs, seed=6).collect()}
    assert a1 == a2
    assert a1 != b  # different seed -> different permutation
    # and it's not the identity order
    assert [a1[i] for i in range(60)] != list(range(1, 61))


def test_seeded_shuffle_layout_invariant(spark):
    docs = _docs(spark, 80)
    base = {r["doc_id"]: r["shuffle_pos"] for r in seeded_shuffle(docs, seed=3).collect()}
    relaid = {
        r["doc_id"]: r["shuffle_pos"]
        for r in seeded_shuffle(docs.repartition(7), seed=3).collect()
    }
    assert base == relaid


def test_interleave_exact_wfq_sequence(spark):
    """weights a:2, b:1 with 4 a-docs and 2 b-docs must produce the exact
    virtual-time order a a b a a b (ties at equal vtime break by source)."""
    rows = [(0, "a"), (1, "a"), (2, "a"), (3, "a"), (10, "b"), (11, "b")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = interleave_sources(df, {"a": 2.0, "b": 1.0}, seed=0)
    seq = [
        r["source"]
        for r in sorted(out.collect(), key=lambda r: r["interleave_pos"])
    ]
    assert seq == ["a", "a", "b", "a", "a", "b"]


def test_interleave_prefix_ratio(spark):
    """In every prefix the heavy source leads by ~its weight ratio: with
    weights 3:1 over equal-size sources, any prefix of length 4k holds 3k
    of the heavy source (until it exhausts)."""
    rows = [(i, "h") for i in range(30)] + [(100 + i, "l") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sorted(
        interleave_sources(df, {"h": 3.0, "l": 1.0}, seed=2).collect(),
        key=lambda r: r["interleave_pos"],
    )
    for k in (4, 8, 20, 40):
        heavy = sum(1 for r in out[:k] if r["source"] == "h")
        assert heavy == min(3 * k // 4, 30)


def test_interleave_drops_unweighted_and_validates(spark):
    rows = [(0, "a"), (1, "zzz")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = interleave_sources(df, {"a": 1.0}, seed=0).collect()
    assert [r["doc_id"] for r in out] == [0]
    with pytest.raises(ValueError, match="positive"):
        interleave_sources(df, {"a": 0.0}, seed=0)


def test_weighted_sample_determinism_and_bias(spark):
    """Efraimidis-Spirakis: layout-invariant, deterministic, and heavier
    weights win more often (statistical pin on a 10x weight gap)."""
    from financial_big_data_spark.operators.sampling import weighted_sample

    rows = [(i, "heavy" if i < 100 else "light", 10.0 if i < 100 else 1.0)
            for i in range(1100)]
    df = spark.createDataFrame(rows, "doc_id long, cls string, w double")
    a = weighted_sample(df, k=100, weight="w", id_cols=["doc_id"])
    b = weighted_sample(df.repartition(7), k=100, weight="w", id_cols=["doc_id"])
    ids_a = sorted(r.doc_id for r in a.collect())
    ids_b = sorted(r.doc_id for r in b.collect())
    assert ids_a == ids_b  # layout-invariant
    # 100 heavy (w=10) vs 1000 light (w=1): heavy mass = 1000/2000 = 1/2,
    # so ~50 of 100 winners should be heavy; demand well above the ~9%
    # a uniform sample would give
    n_heavy = sum(1 for i in ids_a if i < 100)
    assert n_heavy > 25, n_heavy


def test_weighted_sample_merge_property(spark):
    """The weighted-bottom-k of a union == k smallest keys of the parts'
    bottom-k sets (coordinated sample merge law)."""
    from financial_big_data_spark.operators.sampling import weighted_sample

    rows = [(i, float(1 + i % 7)) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    part1 = df.where("doc_id < 200")
    part2 = df.where("doc_id >= 200")
    k = 30
    whole = {r.doc_id for r in weighted_sample(df, k, "w", ["doc_id"]).collect()}
    s1 = weighted_sample(part1, k, "w", ["doc_id"])
    s2 = weighted_sample(part2, k, "w", ["doc_id"])
    merged = {
        r.doc_id
        for r in s1.unionByName(s2).orderBy("_wkey", "doc_id").limit(k).collect()
    }
    assert merged == whole


def test_weighted_sample_grouped_and_validation(spark):
    from financial_big_data_spark.operators.sampling import weighted_sample
    import pytest as _pt

    rows = [(i, "g" + str(i % 3), float(i % 5)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    out = weighted_sample(df, k=5, weight="w", id_cols=["doc_id"], by=["g"])
    per = {}
    for r in out.collect():
        per.setdefault(r.g, []).append(r.doc_id)
        assert r.w > 0  # zero/null weights never win
    assert all(len(v) == 5 for v in per.values()) and len(per) == 3
    with _pt.raises(ValueError):
        weighted_sample(df, k=0, weight="w", id_cols=["doc_id"])


def test_temperature_mix_weights(spark):
    from financial_big_data_spark.operators.sampling import (
        interleave_sources,
        temperature_mix_weights,
    )
    import pytest as _pt

    rows = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    nat = temperature_mix_weights(df, alpha=1.0)
    assert nat["big"] == _pt.approx(0.9) and nat["small"] == _pt.approx(0.1)
    uni = temperature_mix_weights(df, alpha=0.0)
    assert uni["big"] == _pt.approx(0.5) and uni["small"] == _pt.approx(0.5)
    mid = temperature_mix_weights(df, alpha=0.5)
    assert 0.1 < mid["small"] < 0.5  # tail up-sampled, not dominant
    assert sum(mid.values()) == _pt.approx(1.0)
    # feeds interleave_sources directly: prefix mix approximates weights
    ordered = interleave_sources(df, mid).orderBy("interleave_pos").limit(100)
    share_small = sum(1 for r in ordered.collect() if r.source == "small") / 100
    assert share_small == _pt.approx(mid["small"], abs=0.06)
    with _pt.raises(ValueError):
        temperature_mix_weights(df, alpha=1.5)
