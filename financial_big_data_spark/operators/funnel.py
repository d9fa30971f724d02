"""Event-funnel and cohort-retention analytics (beyond-reference event
operators on the engine's event surface).

- ``funnel_conversion``: ordered multi-step funnel (view → click →
  purchase …): a user converts step k when an event of step k's type
  occurs strictly AFTER their step k-1 conversion time (optionally within
  a horizon of step 1). Each step is one keyed aggregation + one keyed
  join — k small (funnel lengths are single digits), every shuffle on the
  uniform user key, no windows over unbounded partitions. Returns one row
  per step: (step, event_type, n_users, conversion overall, step_rate
  vs previous step).
- ``cohort_retention``: classic cohort grid — users grouped by first-seen
  day, activity counted per day offset. Two keyed aggregations and one
  join; output is cohort×offset sized (bounded by days², not data).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_conversion(
    events: DataFrame,
    steps: Sequence[str],
    user: str = "user_id",
    time: str = "ts",
    event_type: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """One row per funnel step: (step 1-based, event_type, n_users,
    conversion = n_users/step-1-users, overall = n_users/step-1-users of
    step 1). ``within`` (an INTERVAL literal, e.g. ``'72 hours'``) bounds
    every later step to that horizon after the user's STEP-1 time."""
    if not steps:
        raise ValueError("steps must be non-empty")
    from ..cache import tracked_persist

    # each stage is persisted (tracked): stage k+1's join and the k
    # per-step counts then read a materialized frame instead of
    # re-executing the whole join chain per action
    reached = tracked_persist(
        events.where(F.col(event_type) == steps[0])
        .groupBy(user)
        .agg(F.min(time).alias("_t1"))
        .withColumn("_prev", F.col("_t1"))
    )
    counts = [reached.count()]
    for step_type in steps[1:]:
        nxt = (
            events.where(F.col(event_type) == step_type)
            .join(reached.select(user, "_t1", "_prev"), on=user)
            .where(
                (F.col(time) > F.col("_prev"))
                & (
                    F.lit(True)
                    if within is None
                    else F.col(time) <= F.col("_t1") + F.expr(f"INTERVAL {within}")
                )
            )
            .groupBy(user)
            .agg(F.min(time).alias("_tn"), F.first("_t1").alias("_t1"))
            .withColumn("_prev", F.col("_tn"))
            .select(user, "_t1", "_prev")
        )
        reached = tracked_persist(nxt)
        counts.append(reached.count())
    spark = events.sparkSession
    base = counts[0]
    rows = []
    for i, (step_type, n) in enumerate(zip(steps, counts)):
        if i == 0:
            rate = 1.0 if n else 0.0
        else:
            prev = counts[i - 1]
            rate = round(n / prev, 6) if prev else 0.0
        rows.append(
            (
                i + 1,
                step_type,
                n,
                rate,
                round(n / base, 6) if base else 0.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "step int, event_type string, n_users bigint, "
        "step_rate double, overall_rate double",
    )


def cohort_retention(
    events: DataFrame,
    user: str = "user_id",
    time: str = "ts",
    max_offset_days: int | None = None,
) -> DataFrame:
    """(cohort_day date, offset_days, n_users): how many of the users
    first seen on ``cohort_day`` were active ``offset_days`` later.
    Offset 0 is the cohort size. Day truncation is NTZ-pure (the
    date_trunc → TIMESTAMP pitfall does not arise: ``to_date`` of an NTZ
    timestamp is wall-clock)."""
    day = F.to_date(F.col(time))
    firsts = events.groupBy(user).agg(F.min(day).alias("cohort_day"))
    activity = events.select(F.col(user), day.alias("_day")).distinct()
    grid = (
        activity.join(firsts, on=user)
        .withColumn("offset_days", F.datediff(F.col("_day"), F.col("cohort_day")))
    )
    if max_offset_days is not None:
        grid = grid.where(F.col("offset_days") <= max_offset_days)
    return grid.groupBy("cohort_day", "offset_days").agg(
        F.countDistinct(user).alias("n_users")
    )
