"""Hierarchical time rollup (hypertable-style continuous aggregates).

Multi-granularity time-bucket aggregation — hour, day, week … — computed
the way a 100 TB store must: the fact table is aggregated ONCE at the
finest granularity, and every coarser level REAGGREGATES the level below
it (hour→day→day→week), merging the mergeable statistics (count, sum,
min, max; avg derives as sum/count at the end). The naive alternative —
one independent GROUP BY per granularity — scans and shuffles the fact
table once per level; here the fact contributes one scan and one
finest-key shuffle, and each coarser level's input is the already-tiny
aggregate above it. Catalyst additionally collapses the union's shared
finest-level subplan into a ReusedExchange, so it is not even computed
twice for the output union.

Truncation uses ``date_trunc`` cast straight back to TIMESTAMP_NTZ:
date_trunc returns a session-TZ TIMESTAMP even for NTZ input, and the
round-trip keeps bucket boundaries wall-clock-pure under any session
timezone (same pitfall as operators/rangejoin.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# coarser levels must truncate a finer bucket to a coarser one correctly;
# this ordering also documents which hierarchies are valid
_GRANULARITY_ORDER = ["minute", "hour", "day", "week", "month", "quarter", "year"]


def _trunc(col: F.Column, granularity: str) -> F.Column:
    return F.date_trunc(granularity, col).cast("timestamp_ntz")


def time_rollup(
    df: DataFrame,
    time_col: str,
    value_col: str,
    keys: Sequence[str] = (),
    granularities: Sequence[str] = ("hour", "day", "week"),
) -> DataFrame:
    """(granularity, bucket, *keys, n_rows, sum_value, avg_value,
    min_value, max_value) — one row per (level, bucket, keys).

    ``granularities`` must run fine → coarse (validated): each level is
    derived from the previous one, so a coarser-before-finer order would
    silently aggregate from the wrong level.
    """
    order = {g: i for i, g in enumerate(_GRANULARITY_ORDER)}
    unknown = [g for g in granularities if g not in order]
    if unknown:
        raise ValueError(f"unknown granularities {unknown}; use {_GRANULARITY_ORDER}")
    ranks = [order[g] for g in granularities]
    if ranks != sorted(ranks) or len(set(ranks)) != len(ranks):
        raise ValueError(
            f"granularities {list(granularities)} must be strictly fine-to-coarse"
        )

    finest = granularities[0]
    level = df.groupBy(
        *keys, _trunc(F.col(time_col), finest).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(value_col).alias("sum_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )
    levels = {finest: level}
    for g in granularities[1:]:
        level = level.groupBy(
            *keys, _trunc(F.col("bucket"), g).alias("bucket")
        ).agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        levels[g] = level

    out = None
    for g, frame in levels.items():
        branch = frame.select(
            F.lit(g).alias("granularity"),
            "bucket",
            *keys,
            "n_rows",
            "sum_value",
            "min_value",
            "max_value",
        )
        out = branch if out is None else out.unionByName(branch)
    return out.withColumn(
        "avg_value", F.try_divide(F.col("sum_value"), F.col("n_rows"))
    )
