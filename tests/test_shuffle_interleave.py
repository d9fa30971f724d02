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
