"""Distributed range (interval) join — the second alignment operator
Spark's DataFrame API lacks (beside ``asof.asof_join``).

Semantics: attach each fact row to every interval row whose
``[start, end)`` window contains the fact's timestamp (optionally also
matching equality keys) — point-in-interval containment, the time-series
"which session/episode/outage does this event belong to" join.

Physical strategy — *bucketized equi-join* (the same binning idea behind
engine-native range-join optimizations, e.g. Databricks' RANGE_JOIN bin
hint, re-expressed in plain DataFrame ops so stock Spark gets it):

    fact  → ONE row keyed by its time bucket floor(epoch/width)
    interval → one row per bucket it overlaps (sequence + explode)
    equi-join on (bucket, *keys) → exact predicate filter

Without this, Catalyst can only plan a theta join (``l.t BETWEEN r.s AND
r.e``) as BroadcastNestedLoopJoin — O(|facts|·|intervals|) comparisons,
a non-starter when the interval side outgrows a broadcast. The bucketed
form is a plain shuffled hash/sort-merge join: each (fact, interval)
match pair meets in EXACTLY ONE bucket (the fact's), so no distinct is
needed and the join is exact. Cost scales as |facts| + Σ(interval
length / bucket width) — pick ``bucket_seconds`` near the typical
interval length so each interval explodes to O(1) buckets.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_time: str,
    start: str,
    end: str,
    bucket_seconds: int = 3600,
    keys: Sequence[str] = (),
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join facts to containing intervals; returns fact columns +
    interval columns (callers project/aggregate downstream).

    ``[start, end)`` by default; ``end_inclusive=True`` widens to
    ``[start, end]``. Invalid intervals (``end`` before ``start``) are
    dropped — a descending bucket ``sequence`` would otherwise fabricate
    buckets. Bucket ids are a WALL-CLOCK-pure function (datediff +
    hour/minute/second arithmetic), NOT ``unix_timestamp`` — that one
    converts through the session timezone, which silently shifts
    TIMESTAMP_NTZ inputs under a non-UTC session. The final predicate
    compares the ORIGINAL columns, so bucket granularity never affects
    results, only fan-out.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds={bucket_seconds} must be positive")
    overlap = set(facts.columns) & set(intervals.columns) - set(keys)
    if overlap:
        raise ValueError(
            f"facts and intervals share non-key columns {sorted(overlap)}; "
            "rename before joining"
        )

    def _bucket(col: str) -> F.Column:
        c = F.col(col)
        wall_epoch = (
            F.datediff(F.to_date(c), F.lit("1970-01-01")).cast("bigint") * 86400
            + F.hour(c) * 3600
            + F.minute(c) * 60
            + F.second(c)
        )
        return F.floor(wall_epoch / F.lit(bucket_seconds))

    f2 = facts.withColumn("_bucket", _bucket(fact_time))
    valid = intervals.where(F.col(end) >= F.col(start))
    i2 = valid.withColumn(
        "_bucket", F.explode(F.sequence(_bucket(start), _bucket(end)))
    )
    joined = f2.join(i2, on=["_bucket", *keys])
    upper = (
        F.col(fact_time) <= F.col(end)
        if end_inclusive
        else F.col(fact_time) < F.col(end)
    )
    return joined.where((F.col(fact_time) >= F.col(start)) & upper).drop("_bucket")
