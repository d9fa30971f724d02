"""As-of join operator: hand-checked cases + invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from financial_big_data_spark.operators.asof import asof_join


def _t(m):
    return dt.datetime(2024, 1, 1, 10, m)


def test_asof_backward_inclusive(spark):
    quotes = spark.createDataFrame(
        [(1, _t(0), 100.0), (1, _t(5), 101.0), (2, _t(1), 50.0)],
        "uid long, ts timestamp_ntz, px double",
    )
    trades = spark.createDataFrame(
        [(1, _t(0), "a"), (1, _t(3), "b"), (1, _t(6), "c"), (2, dt.datetime(2024, 1, 1, 9, 59), "d")],
        "uid long, ts timestamp_ntz, tag string",
    )
    out = {
        r.tag: r.px_asof
        for r in asof_join(trades, quotes, key="uid", left_time="ts").collect()
    }
    # inclusive: trade at 10:00 matches quote at 10:00
    assert out == {"a": 100.0, "b": 100.0, "c": 101.0, "d": None}


def test_asof_preserves_left_rows(spark, bars_df):
    left = bars_df.where("symbol = 'AAA/USDT'").select(
        F.col("symbol"), F.col("ts"), F.col("close")
    )
    right = bars_df.where("symbol = 'AAA/USDT'").select(
        F.col("symbol"), F.col("ts"), F.col("volume")
    ).where(F.hour("ts") == 0)  # sparse right side
    out = asof_join(left, right, key="symbol", left_time="ts", right_cols=["volume"])
    assert out.count() == left.count()
    # every matched value comes from the same-or-earlier day's midnight row
    row = out.where(F.hour("ts") == 5).limit(1).collect()[0]
    assert row.volume_asof is not None


def test_asof_single_shuffle(spark):
    quotes = spark.createDataFrame(
        [(1, _t(0), 100.0)], "uid long, ts timestamp_ntz, px double"
    )
    trades = spark.createDataFrame(
        [(1, _t(3), "b")], "uid long, ts timestamp_ntz, tag string"
    )
    out = asof_join(trades, quotes, key="uid", left_time="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + window: exactly one hash exchange on the key, no join node
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
