"""Validation for the library-free LSTM+attention (ml/lstm_numpy.py):
numerical-gradient agreement for EVERY parameter tensor — in both the
single-layer/single-head and the reference-shaped stacked/multi-head
configuration — plus determinism, dropout semantics, and that the model
actually learns a sequence-order task an order-free model cannot express.
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


def _loss_only(params, x, y, n_heads=1):
    logits = forward(params, x, n_heads=n_heads)
    shifted = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(shifted)
    probs /= probs.sum(axis=1, keepdims=True)
    return -np.log(probs[np.arange(len(y)), y]).mean()


def _check_grads(params, x, y, n_heads, rng):
    _loss, grads = loss_and_grads(params, x, y, n_heads=n_heads)
    eps = 1e-6
    for name, p in params.items():
        flat = p.reshape(-1)
        probe = rng.choice(flat.size, size=min(8, flat.size), replace=False)
        for j in probe:
            orig = flat[j]
            flat[j] = orig + eps
            up = _loss_only(params, x, y, n_heads)
            flat[j] = orig - eps
            dn = _loss_only(params, x, y, n_heads)
            flat[j] = orig
            num = (up - dn) / (2 * eps)
            ana = grads[name].reshape(-1)[j]
            assert ana == pytest.approx(num, rel=2e-4, abs=1e-7), (
                f"{name}[{j}]: analytic {ana} vs numerical {num}"
            )


def test_gradients_match_numerical_single():
    rng = np.random.default_rng(0)
    B, T, Fdim, H, C = 3, 4, 5, 6, 3
    params = init_params(rng, Fdim, H, C, fc_hidden=4)
    x = rng.normal(size=(B, T, Fdim))
    y = rng.integers(0, C, size=B)
    _check_grads(params, x, y, n_heads=1, rng=rng)


def test_gradients_match_numerical_stacked_multihead():
    """The reference-shaped configuration: 2 LSTM layers + 2-head
    attention (with output projection). Dropout off — numerical checks
    need a deterministic forward."""
    rng = np.random.default_rng(4)
    B, T, Fdim, H, C = 3, 4, 3, 8, 3
    params = init_params(rng, Fdim, H, C, fc_hidden=4, n_layers=2, n_heads=2)
    x = rng.normal(size=(B, T, Fdim))
    y = rng.integers(0, C, size=B)
    _check_grads(params, x, y, n_heads=2, rng=rng)


def test_dropout_train_vs_eval():
    """Dropout masks apply only when an rng is supplied (training); the
    inference forward is deterministic and mask-free."""
    rng = np.random.default_rng(5)
    params = init_params(rng, 3, 8, 2, n_layers=2, n_heads=2)
    x = rng.normal(size=(4, 5, 3))
    a = forward(params, x, n_heads=2)
    b = forward(params, x, n_heads=2)
    assert np.array_equal(a, b)
    la, _ = loss_and_grads(
        params, x, np.zeros(4, dtype=int), n_heads=2, dropout=0.5,
        rng=np.random.default_rng(1),
    )
    lb, _ = loss_and_grads(
        params, x, np.zeros(4, dtype=int), n_heads=2, dropout=0.5,
        rng=np.random.default_rng(2),
    )
    assert la != lb  # different masks -> different training loss


def test_training_is_deterministic():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(40, 5, 3))
    y = rng.integers(0, 2, size=40)
    kw = dict(n_classes=2, hidden=8, n_layers=2, n_heads=2, dropout=0.2, epochs=2, seed=9)
    p1 = train_lstm(X, y, **kw)
    p2 = train_lstm(X, y, **kw)
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
