"""Pandas-golden parity for the window-feature library (SURVEY §5.2 item 2).

Each test computes the reference's pandas formulation per symbol and asserts
the Spark column matches within 1e-9 — pinning min_periods, ddof, and
NaN-propagation semantics that the DuckDB oracle can't distinguish.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from financial_big_data_spark.functions.windows import (
    bar_window,
    bollinger,
    log_return,
    pct_change,
    price_diff,
    rolling_mean,
    rolling_std,
    rsi,
    trend_strength,
)
from tests.conftest import assert_series_close

W = None  # built per test from bar_window


def _collect(bars_df, col):
    rows = bars_df.select("symbol", "ts", col.alias("x")).orderBy("symbol", "ts").collect()
    return [r.x for r in rows]


def _expected(bars_pdf, fn):
    out = []
    for _, g in bars_pdf.sort_values(["symbol", "ts"]).groupby("symbol", sort=True):
        out.extend(fn(g).tolist())
    return out


def test_pct_change(bars_df, bars_pdf):
    w = bar_window("symbol", "ts")
    got = _collect(bars_df, pct_change("close", w))
    exp = _expected(bars_pdf, lambda g: g["close"].pct_change())
    assert_series_close(got, exp, name="pct_change")


def test_pct_change_k(bars_df, bars_pdf):
    w = bar_window("symbol", "ts")
    got = _collect(bars_df, pct_change("close", w, periods=24))
    exp = _expected(bars_pdf, lambda g: g["close"].pct_change(24))
    assert_series_close(got, exp, name="pct_change_24")


def test_diff(bars_df, bars_pdf):
    w = bar_window("symbol", "ts")
    got = _collect(bars_df, price_diff("close", w))
    exp = _expected(bars_pdf, lambda g: g["close"].diff())
    assert_series_close(got, exp, name="diff")


def test_log_return(bars_df, bars_pdf):
    w = bar_window("symbol", "ts")
    got = _collect(bars_df, log_return("close", w))
    exp = _expected(bars_pdf, lambda g: np.log(g["close"]).diff())
    assert_series_close(got, exp, name="log_return")


def test_rolling_mean_default_min_periods(bars_df, bars_pdf):
    w = bar_window("symbol", "ts")
    got = _collect(bars_df, rolling_mean("volume", w, 24))
    exp = _expected(bars_pdf, lambda g: g["volume"].rolling(24).mean())
    assert_series_close(got, exp, name="rolling_mean_24")


def test_rolling_mean_min_periods_1(bars_df, bars_pdf):
    w = bar_window("symbol", "ts")
    got = _collect(bars_df, rolling_mean("volume", w, 24, min_periods=1))
    exp = _expected(bars_pdf, lambda g: g["volume"].rolling(24, min_periods=1).mean())
    assert_series_close(got, exp, name="rolling_mean_24_mp1")


def test_rolling_std_over_returns(bars_df, bars_pdf):
    """std of a derived (NaN-leading) series: non-null frame count semantics."""
    w = bar_window("symbol", "ts")
    got = _collect(bars_df, rolling_std(pct_change("close", w), w, 24))
    exp = _expected(bars_pdf, lambda g: g["close"].pct_change().rolling(24).std())
    assert_series_close(got, exp, name="rolling_std_24")


def test_trend_strength(bars_df, bars_pdf):
    w = bar_window("symbol", "ts")
    daily = pct_change("close", w, periods=24)
    got = _collect(bars_df, trend_strength(daily, w, 24))

    def exp_fn(g):
        dr = g["close"].pct_change(24)
        return np.sign(dr).rolling(24).mean().abs()

    exp = _expected(bars_pdf, exp_fn)
    assert_series_close(got, exp, name="trend_strength")


def test_rsi(bars_df, bars_pdf):
    """Reference RSI (lstm_forecasting.py:130-148): simple rolling means,
    min_periods=1, zero-loss → null → neutral 50."""
    w = bar_window("symbol", "ts")
    got = _collect(bars_df, rsi("close", w, 14))

    def exp_fn(g):
        delta = g["close"].diff()
        gain = delta.where(delta > 0, 0.0).rolling(14, min_periods=1).mean()
        loss = (-delta.where(delta < 0, 0.0)).rolling(14, min_periods=1).mean()
        rs = gain / loss.replace(0, np.nan)
        return (100 - 100 / (1 + rs)).fillna(50.0)

    exp = _expected(bars_pdf, exp_fn)
    assert_series_close(got, exp, atol=1e-8, name="rsi_14")


def test_bollinger(bars_df, bars_pdf):
    w = bar_window("symbol", "ts")
    pos, width = bollinger("close", w, 20, 2.0)
    got_pos = _collect(bars_df, pos)
    got_width = _collect(bars_df, width)

    def exp_fn(g):
        ma = g["close"].rolling(20, min_periods=1).mean()
        sd = g["close"].rolling(20, min_periods=1).std()
        upper, lower = ma + 2 * sd, ma - 2 * sd
        pos = (g["close"] - lower) / (upper - lower).replace(0, np.nan)
        return pos

    def exp_width(g):
        ma = g["close"].rolling(20, min_periods=1).mean()
        sd = g["close"].rolling(20, min_periods=1).std()
        return sd / ma.replace(0, np.nan)

    assert_series_close(got_pos, _expected(bars_pdf, exp_fn), atol=1e-8, name="bb_position")
    assert_series_close(got_width, _expected(bars_pdf, exp_width), atol=1e-8, name="bb_width")


def test_macd_bucketed_equals_per_series(spark, bars_df):
    """The bucketed-vectorized MACD (pandas GroupBy.ewm across a bucket)
    must be bit-identical to the per-series grouped-map path."""
    from financial_big_data_spark.functions.ewm import macd

    per_series = macd(bars_df, close="close", series="symbol", time="ts")
    bucketed = macd(bars_df, close="close", series="symbol", time="ts", n_buckets=4)
    key = lambda r: (r.symbol, r.ts)  # noqa: E731
    a = {key(r): (r.macd, r.macd_signal, r.macd_hist) for r in per_series.collect()}
    b = {key(r): (r.macd, r.macd_signal, r.macd_hist) for r in bucketed.collect()}
    assert a == b and len(a) > 0


def test_ewm_mean_bucketed_equals_per_series(spark, bars_df):
    from financial_big_data_spark.functions.ewm import ewm_mean

    a = {
        (r.symbol, r.ts): r.e
        for r in ewm_mean(bars_df, "close", 12, series="symbol", time="ts", out="e").collect()
    }
    b = {
        (r.symbol, r.ts): r.e
        for r in ewm_mean(
            bars_df, "close", 12, series="symbol", time="ts", out="e", n_buckets=4
        ).collect()
    }
    assert a == b and len(a) > 0
