"""Regime-run (gaps-and-islands) and transition analysis (SURVEY.md W12, C6, A17).

The reference walks each symbol's regime series imperatively and emits a row
whenever the label changes (reference
src/clustering/regime_detection/short_term.py:82-132, consumed at
market_analysis.py:107-176). Here the same result is the classic SQL
gaps-and-islands plan, fully distributed:

    change_flag = regime != lag(regime)        -- window, per series
    island      = running sum of change_flag   -- same window spec
    runs        = groupBy(series, island)      -- min/max ts, first regime
    transitions = lead/lag over runs           -- from→to pairing

Shuffle discipline: every step partitions by the series key, so Spark plans
ONE exchange on ``series`` and pipelines the two window stages + the
aggregation within it (the groupBy on (series, island) is a strict refinement
of the window partitioning; AQE keeps partition counts sane).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def regime_runs(
    labeled: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    regime: str = "regime",
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Collapse consecutive equal labels into runs (islands).

    Returns one row per run: series, regime, start_time, end_time, n_rows.
    """
    order = [time] + (order_tiebreak or [])
    w = Window.partitionBy(series).orderBy(*order)
    change = (
        F.when(F.lag(regime).over(w).isNull(), F.lit(1))
        .when(F.col(regime) != F.lag(regime).over(w), F.lit(1))
        .otherwise(F.lit(0))
    )
    island = F.sum(change).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        labeled.withColumn("_island", island)
        .groupBy(series, "_island", regime)
        .agg(
            F.min(time).alias("start_time"),
            F.max(time).alias("end_time"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _duration_hours(start: Column, end: Column) -> Column:
    # (end - start).total_seconds()/3600, reference short_term.py:91.
    # timestamp_diff works for both TIMESTAMP and TIMESTAMP_NTZ and is pure
    # integer arithmetic (no session-timezone dependence).
    return F.timestamp_diff("MICROSECOND", start, end) / F.lit(3_600_000_000.0)


def regime_transitions(
    labeled: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    regime: str = "regime",
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Transitions table matching reference short_term.py:82-111.

    One row per regime *change*: the run being exited becomes
    (from_regime, start_time, end_time, duration, duration_days) and the next
    run's label is to_regime; plus the derived volatility/trend flags
    (short_term.py:107-111, market_analysis.py:119 adds the series column).
    """
    runs = regime_runs(labeled, series, time, regime, order_tiebreak)
    w = Window.partitionBy(series).orderBy("_island")
    to_regime = F.lead(regime).over(w)
    out = (
        runs.withColumn("to_regime", to_regime)
        .where(F.col("to_regime").isNotNull())
        .select(
            F.col(series),
            F.col(regime).alias("from_regime"),
            F.col("to_regime"),
            F.col("start_time"),
            F.col("end_time"),
            _duration_hours(F.col("start_time"), F.col("end_time")).alias("duration"),
            (_duration_hours(F.col("start_time"), F.col("end_time")) / F.lit(24.0)).alias(
                "duration_days"
            ),
        )
    )
    # short_term.py:107-111: volatility increase = calm→volatile; trend change
    # = bull↔bear crossing.
    vol_up = (~F.col("from_regime").contains("volatile")) & F.col("to_regime").contains("volatile")
    bull_bear = F.col("from_regime").contains("bull") & F.col("to_regime").contains("bear")
    bear_bull = F.col("from_regime").contains("bear") & F.col("to_regime").contains("bull")
    return out.withColumn("is_volatility_increase", vol_up).withColumn(
        "is_trend_change", bull_bear | bear_bull
    )


def transition_matrix(transitions: DataFrame) -> DataFrame:
    """(from, to) counts + conditional probability P(to|from) (short_term.py:113-120).

    Map-side partial counts make the shuffle tiny (≤ |regimes|² rows per task).
    """
    counts = transitions.groupBy("from_regime", "to_regime").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    w_from = Window.partitionBy("from_regime")
    return counts.withColumn(
        "probability", F.col("n_transitions") / F.sum("n_transitions").over(w_from)
    )


def top_transitions(transitions: DataFrame, k: int = 5) -> DataFrame:
    """Top-k most common transitions (market_analysis.py:173,618).

    Deterministic tiebreak on the label pair so LIMIT is stable across runs.
    """
    return (
        transitions.groupBy("from_regime", "to_regime")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy(F.desc("n_transitions"), "from_regime", "to_regime")
        .limit(k)
    )
