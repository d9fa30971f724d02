from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from financial_big_data_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def bars_pdf() -> pd.DataFrame:
    """Synthetic OHLCV bars: 3 symbols × 400 hourly rows, FIXTURES.md §1 shape.

    Regime nondegeneracy: injected trending + high-vol segments so all five
    5-way regimes and all three coarse regimes occur; one short-history
    symbol (< 168 rows) exercises window warm-up; prices strictly positive.
    """
    rng = np.random.default_rng(42)
    frames = []
    for sym, (mu, sigma, n) in {
        "AAA/USDT": (0.0005, 0.004, 400),
        "BBB/USDT": (-0.0003, 0.02, 400),
        "CCC/USDT": (0.0, 0.008, 120),  # short history
    }.items():
        drift = np.full(n, mu)
        vol = np.full(n, sigma)
        # trending segment with high directional consistency
        drift[100:160] = 0.02
        drift[220:280] = -0.02
        vol[100:160] = 0.003
        # high-volatility segment
        vol[300:360] = 0.05
        steps = rng.normal(drift[:n], vol[:n])
        close = 100.0 * np.exp(np.cumsum(steps))
        open_ = np.concatenate([[100.0], close[:-1]])
        spread = np.abs(rng.normal(0, 0.3 * sigma, n))
        high = np.maximum(open_, close) * (1 + spread)
        low = np.minimum(open_, close) * (1 - spread)
        volume = np.exp(rng.normal(10, 1, n))
        volume[rng.integers(0, n, 3)] = 0.0  # zero-volume guard rows
        frames.append(
            pd.DataFrame(
                {
                    "symbol": sym,
                    "ts": pd.date_range("2024-01-01", periods=n, freq="h"),
                    "open": open_,
                    "high": high,
                    "low": low,
                    "close": close,
                    "volume": volume,
                }
            )
        )
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="session")
def bars_df(spark, bars_pdf):
    return spark.createDataFrame(bars_pdf)


def assert_series_close(spark_vals, pandas_vals, atol=1e-9, name=""):
    a = np.asarray(spark_vals, dtype=float)
    b = np.asarray(pandas_vals, dtype=float)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    both_nan = np.isnan(a) & np.isnan(b)
    close = np.isclose(a, b, atol=atol, rtol=1e-9)
    ok = both_nan | close
    assert ok.all(), (
        f"{name}: {np.count_nonzero(~ok)} mismatches; "
        f"first at {np.argmax(~ok)}: {a[~ok][:3]} vs {b[~ok][:3]}"
    )
