"""Golden tests for regime labelers against the reference's pandas formulas.

The expected values re-implement the published rules (reference
src/utils.py:4-34 and src/clustering/regime_detection/short_term.py:32-71)
in pandas on the shared fixture — semantics, not code, are compared.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from financial_big_data_spark.operators.regime import (
    ShortTermThresholds,
    coarse_regime,
    detect_regime_5way,
    regime_features,
)


def _pandas_coarse(g: pd.DataFrame) -> pd.Series:
    returns = g["close"].pct_change()
    volatility = returns.rolling(24).std()
    momentum = g["close"].pct_change(24)
    vol_thr = np.percentile(volatility.dropna(), 80)
    mom_thr = np.percentile(momentum.dropna().abs(), 90)
    regime = pd.Series(2, index=g.index)
    bull = (momentum > mom_thr) | ((momentum > 0) & (volatility >= vol_thr))
    bear = (momentum < -mom_thr) | ((momentum < 0) & (volatility >= vol_thr))
    regime[bull] = 0
    regime[bear] = 1
    return regime


def test_coarse_regime_parity(spark, bars_df, bars_pdf):
    out = coarse_regime(bars_df, series="symbol", time="ts", close="close")
    got = {
        (r.symbol, r.ts): r.market_regime
        for r in out.select("symbol", "ts", "market_regime").collect()
    }
    for sym, g in bars_pdf.sort_values(["symbol", "ts"]).groupby("symbol"):
        exp = _pandas_coarse(g)
        for ts, e in zip(g["ts"], exp):
            assert got[(sym, ts)] == e, f"{sym} {ts}: got {got[(sym, ts)]} exp {e}"


def _pandas_5way(g: pd.DataFrame, t: ShortTermThresholds) -> pd.Series:
    hourly = g["close"].pct_change()
    daily = g["close"].pct_change(24)
    vol = hourly.rolling(24).std() * np.sqrt(24)
    trend = np.sign(daily).rolling(24).mean().abs()
    bull = (daily > t.ret) & (trend > t.trend)
    bear = (daily < -t.ret) & (trend > t.trend)
    hivol = vol > t.volatility
    regime = pd.Series("consolidation", index=g.index)
    regime[bull & ~hivol] = "stable_bull"
    regime[bull & hivol] = "volatile_bull"
    regime[bear & ~hivol] = "stable_bear"
    regime[bear & hivol] = "volatile_bear"
    return regime


def test_regime5_parity(spark, bars_df, bars_pdf):
    t = ShortTermThresholds()
    feats = regime_features(bars_df, series="symbol", time="ts", close="close", volume="volume")
    out = detect_regime_5way(feats, t)
    got = {(r.symbol, r.ts): r.regime for r in out.select("symbol", "ts", "regime").collect()}
    all_labels = set()
    for sym, g in bars_pdf.sort_values(["symbol", "ts"]).groupby("symbol"):
        exp = _pandas_5way(g, t)
        all_labels.update(exp.unique())
        for ts, e in zip(g["ts"], exp):
            assert got[(sym, ts)] == e, f"{sym} {ts}: got {got[(sym, ts)]} exp {e}"
    # fixture nondegeneracy: the trending/volatile segments must light up
    # more than just consolidation
    assert len(all_labels) >= 4, f"fixture too degenerate: {all_labels}"


def test_regime5_counts_match_rows(spark, bars_df, bars_pdf):
    feats = regime_features(bars_df, series="symbol", time="ts", close="close", volume="volume")
    out = detect_regime_5way(feats)
    assert out.count() == len(bars_pdf)
    assert out.groupBy("regime").count().agg(F.sum("count")).collect()[0][0] == len(bars_pdf)


def test_coarse_regime_approx_percentile_close_to_exact(spark, bars_df):
    """The approx_percentile scale path must agree with the exact-percentile
    labeling on ~all rows (sketch rank error ≪ the threshold gap)."""
    from financial_big_data_spark.operators.regime import coarse_regime

    exact = coarse_regime(bars_df, order_tiebreak=None).select(
        "symbol", "ts", "market_regime"
    )
    approx = coarse_regime(bars_df, order_tiebreak=None, approx_accuracy=10_000).select(
        "symbol", "ts", F.col("market_regime").alias("market_regime_a")
    )
    joined = exact.join(approx, on=["symbol", "ts"])
    n = joined.count()
    n_same = joined.where("market_regime = market_regime_a").count()
    assert n_same / n >= 0.99
