"""Deterministic HARD regime-forecasting fixture (VERDICT r10 #6).

The sf* events tables give the EP3 pipeline long regime runs, so the
persistence baseline (predict the current regime continues) scores 0.9979
and a trained model's +0.0006 edge demonstrates nothing — the reference's
report (report.pdf p.11) shows a LARGE model-over-trivial-baseline gap on
real data. This fixture manufactures regime dynamics where:

- **persistence ≤ 0.85**: the 5-way labels switch every ~4-7 bars, so the
  no-model baseline pays 1/run-length per bar (measured 0.8125 in steady
  state);
- **windowed features are predictive**: hourly growth cycles through the
  fixed 16-value ``HARD_CYCLE`` pattern, so every labeler input
  (daily_returns = 24-bar window, volatility, trend) — and therefore the
  NEXT bar's label — is an exact function of the cycle phase, and the
  phase is recoverable from the current feature row. A windowed-feature
  model can approach 1.0 where persistence is pinned at ~0.81.

Pattern design (period 16, all prices monotone up so trend_strength = 1
after warm-up; labels then depend on daily_returns vs 1% and volatility
vs 2%): phases 0-3 carry +0.25% log-growth, 5/6 a +1.25%/-1.15% spike
pair (the volatility injection), 8-11 carry -0.15%, the rest +0.05%.
24-bar log return = full-period sum (0.008) + trailing-8 window, which
oscillates across the 1% bull threshold; the spike pair drags the 24-bar
hourly std across the 2% volatility threshold for part of each period.
Steady-state label cycle: stable_bull ×4 → volatile_bull ×5 →
consolidation ×7 (verified by the pinned test and the bench rows).

Pure Column expressions + one cumulative-sum window per series — the
generator itself is distributed (no driver-side materialization), so the
same code manufactures a 10⁹-row fixture on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# period-16 log-growth cycle; sums to +0.008 per period (see module doc)
HARD_CYCLE = (
    0.0025, 0.0025, 0.0025, 0.0025,
    0.0005, 0.0125, -0.0115, 0.0005,
    -0.0015, -0.0015, -0.0015, -0.0015,
    0.0005, 0.0005, 0.0005, 0.0005,
)


def hard_regime_bars(
    spark: SparkSession,
    n_series: int = 16,
    n_bars: int = 2400,
    phase_stride: int = 3,
) -> DataFrame:
    """(user_id, event_id, ts, value) hourly bars, one deterministic
    phase-coded price series per user (series s starts the cycle at phase
    ``s·phase_stride mod 16``, so per-series label cycles are shifted —
    the model must read the phase from features, not memorize one global
    clock)."""
    p = len(HARD_CYCLE)
    cyc = F.array(*[F.lit(v) for v in HARD_CYCLE])
    rows = spark.range(n_series * n_bars).select(
        (F.col("id") / n_bars).cast("long").alias("user_id"),
        (F.col("id") % n_bars).alias("t"),
    )
    phase = (F.col("t") + F.col("user_id") * phase_stride) % p
    w = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return rows.select(
        "user_id",
        F.col("t").alias("event_id"),
        F.expr(
            "timestamp_ntz'2024-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, CAST(t AS INT), 0, 0)"
        ).alias("ts"),
        (
            F.lit(100.0)
            * F.exp(F.sum(F.element_at(cyc, (phase + 1).cast("int"))).over(w))
        ).alias("value"),
    )
