"""Gaps-and-islands transitions: invariants + a hand-built golden case."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from financial_big_data_spark.operators.regime import detect_regime_5way, regime_features
from financial_big_data_spark.operators.transitions import (
    regime_runs,
    regime_transitions,
    top_transitions,
    transition_matrix,
)


def _labeled(bars_df):
    feats = regime_features(bars_df, series="symbol", time="ts", close="close", volume="volume")
    return detect_regime_5way(feats)


def test_golden_small_case(spark):
    """Hand-checkable sequence: runs and from→to pairing."""
    rows = [
        ("S", f"2024-01-01 0{i}:00:00", r)
        for i, r in enumerate(["a", "a", "b", "b", "b", "a", "c"])
    ]
    df = spark.createDataFrame(rows, "symbol string, ts string, regime string").withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )
    tr = regime_transitions(df).orderBy("start_time").collect()
    assert [(t.from_regime, t.to_regime) for t in tr] == [("a", "b"), ("b", "a"), ("a", "c")]
    assert tr[0].start_time.hour == 0 and tr[0].end_time.hour == 1
    assert tr[1].duration == 2.0  # 3-row run spanning 2 hours
    assert tr[1].duration_days == 2.0 / 24


def test_runs_partition_rows(spark, bars_df, bars_pdf):
    """Island sizes must sum to the row count per symbol."""
    labeled = _labeled(bars_df)
    runs = regime_runs(labeled)
    per_sym = {r.symbol: r.total for r in runs.groupBy("symbol").agg(F.sum("n_rows").alias("total")).collect()}
    exp = bars_pdf.groupby("symbol").size().to_dict()
    assert per_sym == exp


def test_transitions_count_is_runs_minus_one(spark, bars_df):
    labeled = _labeled(bars_df)
    n_runs = regime_runs(labeled).groupBy("symbol").count().collect()
    n_tr = {r.symbol: r["count"] for r in regime_transitions(labeled).groupBy("symbol").count().collect()}
    for row in n_runs:
        assert n_tr.get(row.symbol, 0) == row["count"] - 1


def test_transition_probabilities_sum_to_one(spark, bars_df):
    labeled = _labeled(bars_df)
    tr = regime_transitions(labeled)
    m = transition_matrix(tr)
    sums = m.groupBy("from_regime").agg(F.sum("probability").alias("p")).collect()
    for r in sums:
        assert abs(r.p - 1.0) < 1e-9, f"{r.from_regime}: {r.p}"


def test_top_transitions_deterministic(spark, bars_df):
    labeled = _labeled(bars_df)
    tr = regime_transitions(labeled)
    a = [tuple(r) for r in top_transitions(tr, 5).collect()]
    b = [tuple(r) for r in top_transitions(tr, 5).collect()]
    assert a == b
    counts = [r[2] for r in a]
    assert counts == sorted(counts, reverse=True)


def test_no_self_transitions(spark, bars_df):
    labeled = _labeled(bars_df)
    tr = regime_transitions(labeled)
    assert tr.where(F.col("from_regime") == F.col("to_regime")).count() == 0
