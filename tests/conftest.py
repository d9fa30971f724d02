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


def pytest_collection_modifyitems(config, items):
    """Smoke tier (VERDICT r11 #3): `pytest -m smoke` runs a fast
    representative of EVERY test module in <5 min.

    Selection law: any test explicitly marked ``@pytest.mark.smoke``
    represents its module; a module with no explicit mark contributes its
    FIRST collected test. Explicit marks exist exactly where the first
    test is slow (training loops, scale fixtures) — see the SMOKE_PICKS
    overrides below, applied by name so the marked module files stay
    untouched.
    """
    # module -> test name to mark instead of the first (first test is slow)
    SMOKE_PICKS = {
        "test_forecasting": "test_dataset_has_shifted_target",
        "test_lstm_numpy": "test_gradients_match_numerical_single",
        "test_similarity_scale": "test_embedding_near_dups_exact",
        "test_hard_fixture": "test_persistence_capped_and_labels_cycle",
        "test_clustering_quality": "test_kmeans_deterministic_across_runs",
        "test_matview": "test_create_matches_full_aggregate",
        "test_pq": "test_pq_encode_matches_numpy_argmin",
        "test_graph_skew": "test_connected_components_two_cliques",
    }
    by_module: dict[str, list] = {}
    explicit: set[str] = set()
    for it in items:
        mod = it.module.__name__.rsplit(".", 1)[-1]
        by_module.setdefault(mod, []).append(it)
        if it.get_closest_marker("smoke") is not None:
            explicit.add(mod)
    smoke = __import__("pytest").mark.smoke
    for mod, its in by_module.items():
        if mod in explicit:
            continue
        pick = its[0]
        want = SMOKE_PICKS.get(mod)
        if want is not None:
            named = [i for i in its if i.name.split("[")[0] == want]
            if named:
                pick = named[0]
        pick.add_marker(smoke)
