"""Pins for operators/rangejoin.py: the bucketized range (interval) join.

Parity is asserted against the naive theta join (crossJoin + BETWEEN
filter) on small fixtures; the plan test pins WHY the operator exists —
the bucketed form must plan as a hash/sort-merge equi-join, never
BroadcastNestedLoopJoin.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.rangejoin import range_join


def _ts(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


@pytest.fixture(scope="module")
def fixtures(spark):
    facts = spark.createDataFrame(
        [
            (1, "u1", _ts(5, 59)),
            (2, "u1", _ts(6, 0)),    # == start: inclusive
            (3, "u2", _ts(11, 30)),
            (4, "u1", _ts(18, 0)),   # == end: excluded unless end_inclusive
            (5, "u2", _ts(23, 45)),
        ],
        "fact_id long, user string, t timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("morning", _ts(6), _ts(12)),
            ("afternoon", _ts(12), _ts(18)),
            ("allday", _ts(6), _ts(18)),
            ("invalid", _ts(18), _ts(6)),  # end < start: must be dropped
        ],
        "iv_id string, s timestamp, e timestamp",
    )
    return facts, intervals


def _pairs(df):
    return {(r["fact_id"], r["iv_id"]) for r in df.collect()}


def test_range_join_matches_theta_join(spark, fixtures):
    facts, intervals = fixtures
    got = _pairs(range_join(facts, intervals, "t", "s", "e", bucket_seconds=3600))
    want = _pairs(
        facts.crossJoin(intervals).where(
            (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e"))
        )
    )
    assert got == want
    assert (2, "morning") in got and (2, "allday") in got
    assert (4, "morning") not in got and (4, "allday") not in got  # end exclusive
    assert not any(iv == "invalid" for _, iv in got)


def test_range_join_end_inclusive(spark, fixtures):
    facts, intervals = fixtures
    got = _pairs(
        range_join(
            facts, intervals, "t", "s", "e", bucket_seconds=3600, end_inclusive=True
        )
    )
    assert (4, "allday") in got and (4, "afternoon") in got


def test_range_join_bucket_width_invariance(spark, fixtures):
    """Bucket granularity affects fan-out only, never the result set."""
    facts, intervals = fixtures
    fine = _pairs(range_join(facts, intervals, "t", "s", "e", bucket_seconds=600))
    coarse = _pairs(
        range_join(facts, intervals, "t", "s", "e", bucket_seconds=86400)
    )
    assert fine == coarse


def test_range_join_with_keys(spark, fixtures):
    facts, _ = fixtures
    per_user = spark.createDataFrame(
        [("u1", "u1-shift", _ts(0), _ts(12)), ("u2", "u2-shift", _ts(6), _ts(23))],
        "user string, iv_id string, s timestamp, e timestamp",
    )
    got = _pairs(
        range_join(facts, per_user, "t", "s", "e", bucket_seconds=3600, keys=["user"])
    )
    # u1 facts 1,2 fall in u1's [00,12); u1 fact 4 (18:00) does not;
    # u2 fact 3 (11:30) falls in u2's [06,23); u2 fact 5 (23:45) does not;
    # and although fact 3's time fits u1's window, the key bars the match
    assert got == {(1, "u1-shift"), (2, "u1-shift"), (3, "u2-shift")}


def test_range_join_plans_as_equi_join(spark, fixtures):
    facts, intervals = fixtures
    plan = (
        range_join(facts, intervals, "t", "s", "e", bucket_seconds=3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan  # hash or sort-merge equi-join on the bucket key


def test_range_join_session_timezone_invariant(spark):
    """TIMESTAMP_NTZ inputs must join identically under any session
    timezone — the bucket id is wall-clock-pure (unix_timestamp would
    shift NTZ through the session zone and lose matches; this regressed
    once under the driver's non-UTC vanilla probe)."""
    facts = spark.createDataFrame(
        [(1, _ts(5, 59)), (2, _ts(6, 0)), (3, _ts(11, 30)), (4, _ts(18, 0))],
        "fact_id long, t timestamp_ntz",
    )
    intervals = spark.createDataFrame(
        [("w", _ts(6), _ts(18))], "iv_id string, s timestamp_ntz, e timestamp_ntz"
    )
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for zone in ("UTC", "America/New_York", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", zone)
            results[zone] = _pairs(
                range_join(facts, intervals, "t", "s", "e", bucket_seconds=3600)
            )
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert results["UTC"] == {(2, "w"), (3, "w")}
    assert results["America/New_York"] == results["UTC"]
    assert results["Asia/Kathmandu"] == results["UTC"]  # non-whole-hour offset


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    fact_minutes=st.lists(
        st.integers(min_value=0, max_value=3 * 24 * 60), min_size=1, max_size=25
    ),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3 * 24 * 60),
            st.integers(min_value=-120, max_value=12 * 60),
        ),
        min_size=1,
        max_size=8,
    ),
    bucket_seconds=st.sampled_from([60, 600, 3600, 7200]),
)
def test_range_join_property_matches_theta(spark, fact_minutes, ivs, bucket_seconds):
    """Random facts × random (possibly invalid) intervals × random bucket
    width: the bucketized join always equals the theta join restricted to
    valid intervals."""
    base = dt.datetime(2024, 3, 1)
    facts = spark.createDataFrame(
        [(i, base + dt.timedelta(minutes=m)) for i, m in enumerate(fact_minutes)],
        "fact_id long, t timestamp_ntz",
    )
    intervals = spark.createDataFrame(
        [
            (j, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + d))
            for j, (s, d) in enumerate(ivs)
        ],
        "iv_id long, s timestamp_ntz, e timestamp_ntz",
    )
    got = _pairs(
        range_join(facts, intervals, "t", "s", "e", bucket_seconds=bucket_seconds)
    )
    want = _pairs(
        facts.crossJoin(intervals.where(F.col("e") >= F.col("s"))).where(
            (F.col("t") >= F.col("s")) & (F.col("t") < F.col("e"))
        )
    )
    assert got == want


def test_range_join_scale_fanout_bounded(spark):
    """100k facts × 500 intervals: the bucketized join's candidate volume
    stays ~|facts in covered buckets| + Σ(interval_len/bucket), nowhere
    near the 50M-pair theta space — pinned via the count of rows entering
    the exact-predicate filter (each fact meets an interval only via the
    fact's OWN bucket, so candidates per fact ≤ intervals overlapping its
    bucket)."""
    n_facts, n_iv = 100_000, 500
    base = dt.datetime(2024, 1, 1)
    facts = (
        spark.range(n_facts)
        .select(
            F.col("id").alias("fact_id"),
            (
                F.lit(base)
                + F.make_interval(secs=(F.col("id") % 86_400) * F.lit(1.0))
            ).alias("t"),
        )
    )
    intervals = (
        spark.range(n_iv)
        .select(
            F.col("id").alias("iv_id"),
            (
                F.lit(base) + F.make_interval(secs=(F.col("id") * 160) * F.lit(1.0))
            ).alias("s"),
            (
                F.lit(base)
                + F.make_interval(secs=(F.col("id") * 160 + 1800) * F.lit(1.0))
            ).alias("e"),
        )
    )
    out = range_join(facts, intervals, "t", "s", "e", bucket_seconds=3600)
    n_matches = out.count()
    # every interval is 1800s long and fully inside the fact day: expect
    # ~1800 matches per interval (1 fact/second, multiple facts per second
    # collapse modulo); sanity: result is large but far below n_facts*n_iv
    assert 0 < n_matches < n_facts * 20
    # exactness spot check on one interval vs the brute predicate
    one = intervals.where(F.col("iv_id") == 100)
    direct = (
        facts.crossJoin(one)
        .where((F.col("t") >= F.col("s")) & (F.col("t") < F.col("e")))
        .count()
    )
    via = out.where(F.col("iv_id") == 100).count()
    assert via == direct


def test_range_join_validation(spark, fixtures):
    facts, intervals = fixtures
    with pytest.raises(ValueError, match="positive"):
        range_join(facts, intervals, "t", "s", "e", bucket_seconds=0)
    with pytest.raises(ValueError, match="share non-key"):
        range_join(facts, facts.withColumnRenamed("t", "s"), "t", "s", "fact_id")
