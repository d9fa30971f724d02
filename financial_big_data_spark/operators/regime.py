"""Market-regime labeling operators (SURVEY.md §2.2 F6-F8, §2.5 W1-W11).

Two labelers, matching the reference exactly:

1. ``coarse_regime`` — 3-state (0=Bull, 1=Bear, 2=Consolidation) with
   per-series dynamic percentile thresholds (reference src/utils.py:4-34).
2. ``detect_regime_5way`` — 5-state {stable,volatile}x{bull,bear} +
   consolidation with fixed thresholds (reference
   src/clustering/regime_detection/short_term.py:50-80).

Both are pure Column-expression pipelines — no UDFs, fully
Catalyst-optimizable, one shuffle on the series key.

Null semantics note: pandas treats ``NaN > x`` as False, so warm-up rows
(incomplete rolling windows) land in the default regime. Spark's ``when``
treats NULL conditions as false, so the same rows land in ``otherwise`` —
exact parity for free.

Scale: the percentile pass in ``coarse_regime`` is a per-series aggregate
joined back broadcast (two-pass); at 100 TB the aggregate output is one row
per series (~#symbols), always broadcastable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.windows import bar_window, pct_change, rolling_mean, rolling_std, trend_strength


@dataclass(frozen=True)
class ShortTermThresholds:
    """Fixed thresholds (reference short_term.py:12-18)."""

    volatility: float = 0.02  # 2% daily volatility
    ret: float = 0.01  # 1% daily return
    volume: float = 1.5  # 50% above average volume
    trend: float = 0.6  # 60% directional consistency


def regime_features(
    bars: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    close: str = "close",
    volume: str = "volume",
    window_size: int = 24,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Short-term feature block (reference short_term.py:32-48).

    Adds: hourly_returns, daily_returns, volatility (annualized to daily via
    sqrt(24)), volume_ma, volume_ratio, trend_strength, momentum.
    All features share one window spec → single shuffle + single window stage.
    """
    order = [time] + (order_tiebreak or [])
    w = bar_window(series, order)
    hourly = pct_change(close, w)
    daily = pct_change(close, w, periods=window_size)
    return bars.select(
        "*",
        hourly.alias("hourly_returns"),
        daily.alias("daily_returns"),
        (rolling_std(hourly, w, window_size) * F.sqrt(F.lit(float(window_size)))).alias("volatility"),
        rolling_mean(volume, w, window_size).alias("volume_ma"),
        trend_strength(daily, w, window_size).alias("trend_strength"),
        daily.alias("momentum"),
    ).withColumn("volume_ratio", F.try_divide(F.col(volume), F.col("volume_ma")))


def detect_regime_5way(
    features: DataFrame,
    thresholds: ShortTermThresholds = ShortTermThresholds(),
) -> DataFrame:
    """5-state classifier over the ``regime_features`` output.

    Reference short_term.py:56-71: bull/bear require |daily return| beyond
    the threshold AND trend consistency; the volatility split is orthogonal;
    everything else (including warm-up NULL rows) is consolidation.
    """
    bull = (F.col("daily_returns") > thresholds.ret) & (F.col("trend_strength") > thresholds.trend)
    bear = (F.col("daily_returns") < -thresholds.ret) & (F.col("trend_strength") > thresholds.trend)
    high_vol = F.col("volatility") > thresholds.volatility
    regime = (
        F.when(bull & ~high_vol, "stable_bull")
        .when(bull & high_vol, "volatile_bull")
        .when(bear & ~high_vol, "stable_bear")
        .when(bear & high_vol, "volatile_bear")
        .otherwise("consolidation")
    )
    return features.withColumn("regime", regime)


def coarse_regime(
    bars: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    close: str = "close",
    volatility_window: int = 24,
    momentum_window: int = 24,
    volatility_percentile: float = 80.0,
    momentum_percentile: float = 90.0,
    order_tiebreak: list[str] | None = None,
    approx_accuracy: int | None = None,
    sketch_k: int | None = None,
    sketch_id_cols: list[str] | None = None,
) -> DataFrame:
    """3-state regime with per-series dynamic thresholds (src/utils.py:4-34).

    Two-pass plan: (1) window stage computes rolling volatility + momentum;
    (2) per-series exact percentiles (``percentile`` — linear interpolation,
    numpy-compatible; NOT ``percentile_approx``) aggregated to one row per
    series and **broadcast-joined** back. The thresholds are computed over the
    series' full history — the reference labels before any date filtering
    (leak-by-design, data_merger.py:30) and we preserve that.

    Threshold routing (exact stays the default/oracle path):

    - ``approx_accuracy``: KLL ``approx_percentile`` — constant sketch
      memory per group, rank error 1/accuracy.
    - ``sketch_k``: the bottom-k coordinated-sample route
      (operators/sketches.py ``bottomk_rows``): thresholds are exact
      interpolated percentiles over a deterministic uniform k-row sample
      per series. At 100 TB the exact path's per-group ``percentile``
      buffers a whole series' history in one aggregate; this retains k
      rows per series and — unlike KLL — the sample is MERGEABLE across
      days/partitions, so rolling ingest can maintain it incrementally.
      Rank error by DKW: |F̂(t) − F(t)| ≤ ε with prob ≥ 1−δ for
      ε = sqrt(ln(2/δ)/(2k)) — k=128 gives ±0.12 rank at 95% confidence,
      k=512 ±0.06; a series with ≤ k rows is sampled whole (exact).

    Returns bars + volatility, momentum, market_regime (0 bull / 1 bear /
    2 consolidation).
    """
    if approx_accuracy is not None and sketch_k is not None:
        raise ValueError("pass at most one of approx_accuracy / sketch_k")
    order = [time] + (order_tiebreak or [])
    w = bar_window(series, order)
    returns = pct_change(close, w)
    with_feats = bars.select(
        "*",
        rolling_std(returns, w, volatility_window).alias("volatility"),
        pct_change(close, w, periods=momentum_window).alias("momentum"),
    )
    # The feature frame feeds BOTH the threshold aggregate and the label
    # branch; without a cache the scan+shuffle+window stage runs twice
    # (the dominant cost at scale). MEMORY_AND_DISK keeps the contract safe
    # when the projection exceeds executor memory. Tracked so long-lived
    # sessions can bulk-release between queries (cache.release_tracked).
    from ..cache import tracked_persist

    with_feats = tracked_persist(with_feats)

    if approx_accuracy is None:
        # exact linear-interpolation percentile (numpy parity, oracle-checked)
        # — buffers one series' values per group; right up to ~1e6 rows/series
        vol_thr = F.expr(f"percentile(volatility, {volatility_percentile / 100.0})")
        mom_thr = F.expr(f"percentile(abs(momentum), {momentum_percentile / 100.0})")
    else:
        # scale path: KLL-sketch approx_percentile — constant memory per
        # group regardless of series length; accuracy = 1/approx_accuracy
        # relative rank error (e.g. 10000 → 0.01% rank error)
        vol_thr = F.expr(
            f"approx_percentile(volatility, {volatility_percentile / 100.0}, {approx_accuracy})"
        )
        mom_thr = F.expr(
            f"approx_percentile(abs(momentum), {momentum_percentile / 100.0}, {approx_accuracy})"
        )
    if sketch_k is not None:
        # bottom-k sample per series (deterministic in the row ids), then
        # EXACT interpolated percentiles over the bounded sample.
        # sketch_id_cols overrides the sample key when the caller has a
        # unique row id (one int hashed instead of a 3-column concat —
        # and a key DuckDB can reproduce for cross-engine oracles).
        from .sketches import bottomk_rows

        ids = sketch_id_cols or [series, time] + (order_tiebreak or [])
        samp = bottomk_rows(
            with_feats.select(
                series, *[c for c in ids if c != series],
                "volatility", "momentum",
            ),
            sketch_k,
            id_cols=ids,
            keep=["volatility", "momentum"],
            by=[series],
        )
        thresholds = samp.groupBy(series).agg(
            F.expr(
                f"percentile(volatility, {volatility_percentile / 100.0})"
            ).alias("volatility_threshold"),
            F.expr(
                f"percentile(abs(momentum), {momentum_percentile / 100.0})"
            ).alias("momentum_threshold"),
        )
    else:
        thresholds = with_feats.groupBy(series).agg(
            vol_thr.alias("volatility_threshold"),
            mom_thr.alias("momentum_threshold"),
        )

    labeled = with_feats.join(F.broadcast(thresholds), on=series, how="left")
    is_volatile = F.col("volatility") >= F.col("volatility_threshold")
    mom = F.col("momentum")
    thr = F.col("momentum_threshold")
    bull = (mom > thr) | ((mom > 0) & is_volatile)
    bear = (mom < -thr) | ((mom < 0) & is_volatile)
    # Reference applies bull then bear sequentially (utils.py:29-32); the two
    # masks are disjoint for thr >= 0, so bear-after-bull == when-chain.
    market_regime = F.when(bear, 1).when(bull, 0).otherwise(2)
    return labeled.withColumn("market_regime", market_regime).drop(
        "volatility_threshold", "momentum_threshold"
    )
