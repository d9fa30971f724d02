"""Distributed LPA / connected components + skew-mitigation operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.ml.graph import connected_components, label_propagation
from financial_big_data_spark.operators.skew import salted_agg, salted_count, salted_join


def _two_cliques(spark):
    # two 4-cliques bridged by nothing
    edges = []
    for base in (0, 10):
        nodes = [base + i for i in range(4)]
        edges += [(a, b) for a in nodes for b in nodes if a < b]
    return spark.createDataFrame(edges, "src long, dst long")


def test_connected_components_two_cliques(spark):
    comp = {r.node: r.component for r in connected_components(_two_cliques(spark)).collect()}
    assert {comp[i] for i in range(4)} == {0}
    assert {comp[10 + i] for i in range(4)} == {10}


def test_label_propagation_two_cliques(spark):
    lab = {r.node: r.community for r in label_propagation(_two_cliques(spark)).collect()}
    assert len({lab[i] for i in range(4)}) == 1
    assert len({lab[10 + i] for i in range(4)}) == 1
    assert lab[0] != lab[10]


def test_connected_components_chain(spark):
    # a path graph: one component, diameter > 1 iteration
    edges = spark.createDataFrame([(i, i + 1) for i in range(12)], "src long, dst long")
    comp = connected_components(edges)
    assert comp.select("component").distinct().count() == 1


@pytest.fixture(scope="module")
def skewed_df(spark):
    # key "hot" holds 90% of rows
    hot = spark.range(9000).select(
        F.lit("hot").alias("key"), F.col("id").alias("rid"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("k"), (F.col("id") % 20).cast("string")).alias("key"),
        (F.col("id") + 100000).alias("rid"),
        (F.col("id") % 31).cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_count_matches_plain(spark, skewed_df):
    plain = {r.key: r["count"] for r in skewed_df.groupBy("key").count().collect()}
    salted = {r.key: r.n for r in salted_count(skewed_df, "key", "rid").collect()}
    assert salted == plain


def test_salted_agg_matches_plain(spark, skewed_df):
    plain = {
        r.key: (r.n, round(r.s, 6), round(r.m, 9), r.mn, r.mx)
        for r in skewed_df.groupBy("key")
        .agg(
            F.count("v").alias("n"),
            F.sum("v").alias("s"),
            F.avg("v").alias("m"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    got = {
        r.key: (r.n, round(r.sum, 6), round(r.mean, 9), r.min, r.max)
        for r in salted_agg(skewed_df, "key", "v", "rid").collect()
    }
    assert got == plain


def test_salted_join_matches_plain(spark, skewed_df):
    dim = spark.createDataFrame(
        [("hot", 1.5)] + [(f"k{i}", float(i)) for i in range(20)], "key string, factor double"
    )
    plain = skewed_df.join(dim, on="key").agg(F.sum(F.col("v") * F.col("factor"))).collect()[0][0]
    salted = (
        salted_join(skewed_df, dim, "key", "rid")
        .agg(F.sum(F.col("v") * F.col("factor")))
        .collect()[0][0]
    )
    assert abs(plain - salted) < 1e-6
    # row counts preserved
    assert salted_join(skewed_df, dim, "key", "rid").count() == skewed_df.join(dim, "key").count()
