"""Pins for operators/funnel.py: ordered funnel semantics (strict
ordering, horizon bound, re-entry irrelevance) and the cohort grid."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.funnel import (
    cohort_retention,
    funnel_conversion,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp_ntz")


def _t(d, h=0):
    return dt.datetime(2024, 1, d, h)


@pytest.fixture(scope="module")
def funnel_events(spark):
    rows = [
        # u1 completes the full funnel in order
        (1, "view", _t(1)), (1, "click", _t(1, 2)), (1, "purchase", _t(1, 5)),
        # u2 clicks BEFORE viewing -> click doesn't count; no purchase
        (2, "click", _t(1)), (2, "view", _t(1, 3)),
        # u3 views then clicks; purchase outside the 72h horizon
        (3, "view", _t(2)), (3, "click", _t(2, 1)), (3, "purchase", _t(9)),
        # u4 views only
        (4, "view", _t(3)),
        # u5 never views; click+purchase never count
        (5, "click", _t(1)), (5, "purchase", _t(1, 1)),
    ]
    return _ev(spark, rows)


def test_funnel_ordered_semantics(spark, funnel_events):
    out = {
        r["step"]: r
        for r in funnel_conversion(
            funnel_events, ["view", "click", "purchase"], within="72 hours"
        ).collect()
    }
    assert out[1]["n_users"] == 4          # u1 u2 u3 u4
    assert out[2]["n_users"] == 2          # u1, u3 (u2's click precedes view)
    assert out[3]["n_users"] == 1          # u1 only (u3's purchase beyond 72h)
    assert out[2]["step_rate"] == pytest.approx(0.5)
    assert out[3]["step_rate"] == pytest.approx(0.5)
    assert out[3]["overall_rate"] == pytest.approx(0.25)
    assert out[1]["step_rate"] == 1.0


def test_funnel_no_horizon(spark, funnel_events):
    out = {
        r["step"]: r["n_users"]
        for r in funnel_conversion(
            funnel_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert out[3] == 2  # without the horizon u3's late purchase counts


def test_funnel_empty_first_step(spark, funnel_events):
    out = funnel_conversion(funnel_events, ["signup", "purchase"]).collect()
    rows = {r["step"]: r for r in out}
    assert rows[1]["n_users"] == 0 and rows[1]["step_rate"] == 0.0
    assert rows[2]["n_users"] == 0 and rows[2]["overall_rate"] == 0.0
    with pytest.raises(ValueError):
        funnel_conversion(funnel_events, [])


def test_cohort_retention_grid(spark):
    rows = [
        (1, "view", _t(1)), (1, "view", _t(2)), (1, "view", _t(4)),
        (2, "view", _t(1, 5)),
        (3, "view", _t(2)), (3, "view", _t(3)),
    ]
    out = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for r in cohort_retention(_ev(spark, rows)).collect()
    }
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    assert out[(d1, 0)] == 2          # u1, u2 first seen day 1
    assert out[(d1, 1)] == 1          # u1 active day 2
    assert out[(d1, 3)] == 1          # u1 active day 4
    assert out[(d2, 0)] == 1 and out[(d2, 1)] == 1  # u3
    assert (d1, 2) not in out


def test_cohort_retention_offset_cap(spark):
    rows = [(1, "view", _t(1)), (1, "view", _t(8))]
    out = cohort_retention(_ev(spark, rows), max_offset_days=3).collect()
    assert {r["offset_days"] for r in out} == {0}
