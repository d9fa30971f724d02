"""Validation for the library-free LSTM+attention (ml/lstm_numpy.py):
numerical-gradient agreement for EVERY parameter tensor, determinism, and
that the model actually learns a sequence-order task an order-free model
cannot express.
"""

from __future__ import annotations

import numpy as np
import pytest

from financial_big_data_spark.ml.lstm_numpy import (
    forward,
    init_params,
    loss_and_grads,
    predict,
    train_lstm,
)


def _loss_only(params, x, y):
    logits = forward(params, x)
    shifted = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(shifted)
    probs /= probs.sum(axis=1, keepdims=True)
    return -np.log(probs[np.arange(len(y)), y]).mean()


def test_gradients_match_numerical():
    rng = np.random.default_rng(0)
    B, T, Fdim, H, C = 3, 4, 5, 6, 3
    params = init_params(rng, Fdim, H, C, fc_hidden=4)
    x = rng.normal(size=(B, T, Fdim))
    y = rng.integers(0, C, size=B)
    _loss, grads = loss_and_grads(params, x, y)
    eps = 1e-6
    for name, p in params.items():
        flat = p.reshape(-1)
        # probe a handful of coordinates per tensor
        probe = rng.choice(flat.size, size=min(8, flat.size), replace=False)
        for j in probe:
            orig = flat[j]
            flat[j] = orig + eps
            up = _loss_only(params, x, y)
            flat[j] = orig - eps
            dn = _loss_only(params, x, y)
            flat[j] = orig
            num = (up - dn) / (2 * eps)
            ana = grads[name].reshape(-1)[j]
            assert ana == pytest.approx(num, rel=2e-4, abs=1e-7), (
                f"{name}[{j}]: analytic {ana} vs numerical {num}"
            )


def test_training_is_deterministic():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(40, 5, 3))
    y = rng.integers(0, 2, size=40)
    p1 = train_lstm(X, y, n_classes=2, hidden=8, epochs=2, seed=9)
    p2 = train_lstm(X, y, n_classes=2, hidden=8, epochs=2, seed=9)
    for k in p1:
        assert np.array_equal(p1[k], p2[k])


def test_learns_sequence_order_task():
    """Label = whether the signal spike lands in the first or second half
    of the window — position information a bag-of-features model cannot
    see; the LSTM+attention must reach high accuracy."""
    rng = np.random.default_rng(2)
    n, T = 400, 10
    X = rng.normal(0, 0.1, size=(n, T, 2))
    y = rng.integers(0, 2, size=n)
    for i in range(n):
        pos = rng.integers(0, T // 2) if y[i] == 0 else rng.integers(T // 2, T)
        X[i, pos, 0] += 3.0
    split = 300
    params = train_lstm(
        X[:split], y[:split], n_classes=2,
        val=(X[split:], y[split:]),
        hidden=16, epochs=12, batch_size=32, seed=3,
    )
    acc = float((predict(params, X[split:]) == y[split:]).mean())
    assert acc >= 0.9, acc
