"""Pins for operators/rollup.py: hierarchical time rollup.

The DuckDB oracle (ev_time_rollup) recomputes every level independently
from raw rows, hash-checking the merge algebra on real data; here we pin
hand-computable semantics and the level-derivation contract on a tiny
fixture.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.rollup import time_rollup


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        # two hours on Monday 2024-03-04, one hour on Tuesday
        ("a", dt.datetime(2024, 3, 4, 9, 15), 1.0),
        ("a", dt.datetime(2024, 3, 4, 9, 45), 3.0),
        ("a", dt.datetime(2024, 3, 4, 10, 5), 5.0),
        ("a", dt.datetime(2024, 3, 5, 9, 0), 7.0),
        # second key, same Monday 9:00 hour
        ("b", dt.datetime(2024, 3, 4, 9, 59), 10.0),
        # the following Monday — different ISO week
        ("a", dt.datetime(2024, 3, 11, 0, 0), 100.0),
    ]
    return spark.createDataFrame(rows, "k string, t timestamp_ntz, v double")


def _by(out, granularity, keys=()):
    rows = [r for r in out.collect() if r["granularity"] == granularity]
    return {tuple([r["bucket"]] + [r[k] for k in keys]): r for r in rows}


def test_time_rollup_merge_algebra(spark, facts):
    out = time_rollup(facts, "t", "v", granularities=("hour", "day", "week"))
    hours = _by(out, "hour")
    assert hours[(dt.datetime(2024, 3, 4, 9, 0),)]["n_rows"] == 3  # a,a,b
    assert hours[(dt.datetime(2024, 3, 4, 9, 0),)]["sum_value"] == 14.0
    days = _by(out, "day")
    d = days[(dt.datetime(2024, 3, 4),)]
    assert d["n_rows"] == 4 and d["sum_value"] == 19.0
    assert d["min_value"] == 1.0 and d["max_value"] == 10.0
    assert d["avg_value"] == pytest.approx(19.0 / 4)
    weeks = _by(out, "week")
    w1 = weeks[(dt.datetime(2024, 3, 4),)]  # Mon 3/4 week holds 3/4 + 3/5
    assert w1["n_rows"] == 5 and w1["sum_value"] == 26.0
    w2 = weeks[(dt.datetime(2024, 3, 11),)]
    assert w2["n_rows"] == 1 and w2["sum_value"] == 100.0


def test_time_rollup_matches_direct_groupby(spark, facts):
    """Reaggregating day from hour must equal grouping raw rows by day."""
    out = time_rollup(facts, "t", "v", granularities=("hour", "day"))
    days = {
        (r["bucket"],): (r["n_rows"], r["sum_value"], r["min_value"], r["max_value"])
        for r in out.collect()
        if r["granularity"] == "day"
    }
    direct = {
        (r["bucket"],): (r["n"], r["s"], r["mn"], r["mx"])
        for r in facts.groupBy(
            F.date_trunc("day", "t").cast("timestamp_ntz").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert days == direct


def test_time_rollup_with_keys(spark, facts):
    out = time_rollup(facts, "t", "v", keys=["k"], granularities=("hour", "day"))
    days = _by(out, "day", keys=["k"])
    assert days[(dt.datetime(2024, 3, 4), "a")]["n_rows"] == 3
    assert days[(dt.datetime(2024, 3, 4), "b")]["n_rows"] == 1
    assert days[(dt.datetime(2024, 3, 5), "a")]["sum_value"] == 7.0


def test_time_rollup_validation(spark, facts):
    with pytest.raises(ValueError, match="fine-to-coarse"):
        time_rollup(facts, "t", "v", granularities=("day", "hour"))
    with pytest.raises(ValueError, match="fine-to-coarse"):
        time_rollup(facts, "t", "v", granularities=("hour", "hour"))
    with pytest.raises(ValueError, match="unknown"):
        time_rollup(facts, "t", "v", granularities=("hour", "fortnight"))


def test_time_rollup_single_fact_shuffle(spark, facts):
    """At runtime the fact is aggregated ONCE at the finest grain: AQE's
    stage reuse replaces the day branch's hour-level exchange and the week
    branch's day-level exchange with ReusedExchange — asserted on the
    EXECUTED final adaptive plan (the pre-execution plan still prints the
    unshared branches; reuse is resolved per shuffle stage at runtime)."""
    out = time_rollup(facts, "t", "v", granularities=("hour", "day", "week"))
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ReusedExchange") >= 2, plan
