"""EP2: the reference's market-analysis pipeline as one Spark DAG.

Reference entry point ``python main.py --market_analysis`` (reference
main.py:26-65 → market_analysis.py:652-736). Stages and their physical
design:

1.  **Scan + label** — one pass over the bar table; coarse regime thresholds
    computed over FULL history before any period filter (leak-by-design,
    reference data_merger.py:30 before market_analysis.py:675 — replicated
    faithfully, see SURVEY §7 hard-part 5).
2.  **Period filter** — pushed to the scan by Catalyst where possible.
3.  **Window features + 5-way classify** — a single window stage: every
    feature shares partitionBy(series).orderBy(time), so ONE shuffle on the
    series key serves the whole block.
4.  **Cache** — the labeled frame feeds four branches (distribution,
    transitions, daily buckets, per-series profiles); the reference reuses
    its merged frame the same way (market_analysis.py:656).
5.  **Branches** — each an independent aggregation; the transitions branch
    re-uses the series partitioning (no extra exchange before the island
    groupBy thanks to co-partitioning).

Returns small result DataFrames only — nothing driver-side except the ≤
|series| cluster inputs, mirroring §4.2's "never collect fact data".
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist
from ..functions.stats import kurtosis_pandas, skew_pandas, with_group_total
from ..operators.regime import ShortTermThresholds, detect_regime_5way, regime_features
from ..operators.transitions import regime_transitions, top_transitions, transition_matrix


@dataclass
class MarketAnalysisResult:
    regime_distribution: DataFrame
    transitions: DataFrame
    transition_matrix: DataFrame
    top_transitions: DataFrame
    daily_regime: DataFrame
    profiles: DataFrame
    period_stats: DataFrame
    _cached: list = field(default_factory=list)

    def unpersist(self) -> None:
        for df in self._cached:
            df.unpersist()


def market_analysis_plan(
    bars: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    close: str = "close",
    volume: str = "volume",
    start: str | None = None,
    end: str | None = None,
    thresholds: ShortTermThresholds = ShortTermThresholds(),
    order_tiebreak: list[str] | None = None,
) -> MarketAnalysisResult:
    """Run the full EP2 DAG and return its result tables.

    CACHE LIFETIME: the plan persists its shared labeled frame (and the
    branches read it lazily), so a library caller must call
    ``result.unpersist()`` after materializing the branches it needs —
    the caches stay pinned until then (or until a bulk
    ``cache.release_tracked()``; the query registry and bench do this
    between queries automatically).
    """
    if start is not None:
        bars = bars.where(F.col(time) >= F.lit(start).cast("timestamp_ntz"))
    if end is not None:
        bars = bars.where(F.col(time) <= F.lit(end).cast("timestamp_ntz"))

    feats = regime_features(
        bars, series=series, time=time, close=close, volume=volume,
        window_size=24, order_tiebreak=order_tiebreak,
    )
    # Cache ONLY what the downstream branches read — a narrow projection
    # caches ~4x cheaper than the full feature frame and every branch is a
    # pure aggregate over these columns.
    keep = [series, time, *(order_tiebreak or []), close, "regime", "hourly_returns"]
    if volume != close:
        keep.append(volume)
    labeled = tracked_persist(detect_regime_5way(feats, thresholds).select(*dict.fromkeys(keep)))

    counts = labeled.groupBy("regime").agg(F.count(F.lit(1)).alias("n"))
    # post-aggregate total over ≤5 regime rows (with_group_total): the
    # crossJoin form scheduled the cached-labeled scan + aggregate twice
    regime_distribution = with_group_total(counts).select(
        "regime", "n", (F.col("n") / F.col("_total")).alias("share")
    )

    transitions = tracked_persist(regime_transitions(
        labeled, series=series, time=time, regime="regime", order_tiebreak=order_tiebreak
    ))
    tmatrix = transition_matrix(transitions)
    top5 = top_transitions(transitions, 5)

    daily_regime = labeled.groupBy(
        F.date_trunc("day", F.col(time)).cast("date").alias("day"), "regime"
    ).agg(F.count(F.lit(1)).alias("n"))

    # profiles reuse the cached per-row returns — no second scan or window
    # stage over the bars (the reference recomputes detect_regime per branch,
    # the anti-pattern SURVEY §4.1 flags; we share one pass)
    profiles = labeled.groupBy(series).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.avg("hourly_returns").alias("mean_return"),
        F.stddev_samp("hourly_returns").alias("volatility"),
        skew_pandas(F.col("hourly_returns")).alias("skewness"),
        kurtosis_pandas(F.col("hourly_returns")).alias("kurtosis"),
        F.avg(volume).alias("volume_mean"),
        F.try_divide(F.stddev_samp(volume), F.avg(volume)).alias("volume_cv"),
        F.corr(volume, close).alias("volume_price_corr"),
        F.min(close).alias("price_min"),
        F.max(close).alias("price_max"),
        F.try_divide(F.max(close) - F.min(close), F.avg(close)).alias("price_range"),
    )

    # period statistics block (reference market_analysis.py:607-626)
    period_stats = labeled.agg(
        F.countDistinct(series).alias("n_series"),
        F.count(F.lit(1)).alias("n_rows"),
        F.avg(volume).alias("avg_volume"),
        F.stddev_samp("hourly_returns").alias("volatility"),
        F.countDistinct("regime").alias("n_regimes"),
    )

    return MarketAnalysisResult(
        regime_distribution=regime_distribution,
        transitions=transitions,
        transition_matrix=tmatrix,
        top_transitions=top5,
        daily_regime=daily_regime,
        profiles=profiles,
        period_stats=period_stats,
        _cached=[labeled, transitions],
    )
