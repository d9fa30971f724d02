"""Library-free LSTM + self-attention regime predictor (M6/M7, no torch).

The reference topology (reference src/models/lstm_forecasting.py:16-34) is
LSTM → multi-head self-attention → ReLU FC head, reading the attention
output at the LAST sequence position. torch is absent from this container,
so this module implements the same model class in pure numpy: forward
pass, full manual backpropagation (BPTT through the LSTM and through the
last-position attention), softmax cross-entropy, and Adam — validated by a
numerical-gradient test (tests/test_lstm_numpy.py). Defaults are sized
down from the reference's LSTM(128)×2 + 4 heads to hidden 32 / one
recurrent layer / one head — the CLASS of model is the same, the capacity
knob is exposed.

Because the head only reads attention at the last position, attention
needs just ONE query vector (the last hidden state): scores over the T
keys, one softmax, one context vector — O(B·T·H) instead of O(B·T²·H),
with identical output to full self-attention sliced at [:, -1].

Scale contract: Spark prepares features, windows and splits distributed
(shared with seq_mlp_classifier); TRAINING runs driver-side over the
collected train split — the reference's torch loop is equally single-node
— and epoch selection is validation-monitored like the reference's
val-tracked epochs; INFERENCE is distributed (Arrow-batched pandas UDF
with the trained weights broadcast, ml/forecasting.py
lstm_regime_classifier). A GPU framework swaps in through the same
(X, y) → params seam at production scale.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "init_params",
    "forward",
    "loss_and_grads",
    "train_lstm",
    "predict",
]


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(x, -60, 60)))


def init_params(
    rng: np.random.Generator,
    n_features: int,
    hidden: int,
    n_classes: int,
    fc_hidden: int | None = None,
) -> dict[str, np.ndarray]:
    """Glorot-ish init; forget-gate bias starts at 1 (standard LSTM trick
    so early training does not forget everything)."""
    fc_hidden = fc_hidden or max(hidden // 2, 4)
    sf = 1.0 / np.sqrt(n_features)
    sh = 1.0 / np.sqrt(hidden)
    p = {
        "Wx": rng.normal(0, sf, (n_features, 4 * hidden)),
        "Wh": rng.normal(0, sh, (hidden, 4 * hidden)),
        "b": np.zeros(4 * hidden),
        "Wq": rng.normal(0, sh, (hidden, hidden)),
        "Wk": rng.normal(0, sh, (hidden, hidden)),
        "Wv": rng.normal(0, sh, (hidden, hidden)),
        "W1": rng.normal(0, sh, (hidden, fc_hidden)),
        "b1": np.zeros(fc_hidden),
        "W2": rng.normal(0, 1.0 / np.sqrt(fc_hidden), (fc_hidden, n_classes)),
        "b2": np.zeros(n_classes),
    }
    p["b"][hidden : 2 * hidden] = 1.0
    return p


def forward(params: dict, x: np.ndarray, want_cache: bool = False):
    """x: (B, T, F) float64 → logits (B, C); cache for backward."""
    B, T, _ = x.shape
    H = params["Wh"].shape[0]
    Wx, Wh, b = params["Wx"], params["Wh"], params["b"]
    h = np.zeros((B, H))
    c = np.zeros((B, H))
    hs = np.zeros((B, T, H))
    steps = []
    for t in range(T):
        z = x[:, t] @ Wx + h @ Wh + b
        i = _sigmoid(z[:, :H])
        f = _sigmoid(z[:, H : 2 * H])
        g = np.tanh(z[:, 2 * H : 3 * H])
        o = _sigmoid(z[:, 3 * H :])
        c_prev = c
        c = f * c_prev + i * g
        ct = np.tanh(c)
        h_prev = steps[-1][7] if steps else np.zeros((B, H))
        h = o * ct
        hs[:, t] = h
        steps.append((i, f, g, o, c_prev, c, ct, h, h_prev))
    # attention: one query (last hidden), T keys/values
    q = hs[:, -1] @ params["Wq"]                       # (B, H)
    K = hs @ params["Wk"]                              # (B, T, H)
    V = hs @ params["Wv"]                              # (B, T, H)
    scores = np.einsum("bh,bth->bt", q, K) / np.sqrt(H)
    scores -= scores.max(axis=1, keepdims=True)
    alpha = np.exp(scores)
    alpha /= alpha.sum(axis=1, keepdims=True)          # (B, T)
    ctx = np.einsum("bt,bth->bh", alpha, V)            # (B, H)
    z1 = ctx @ params["W1"] + params["b1"]
    a1 = np.maximum(z1, 0.0)
    logits = a1 @ params["W2"] + params["b2"]
    if not want_cache:
        return logits
    return logits, (x, hs, steps, q, K, V, alpha, ctx, z1, a1)


def loss_and_grads(params: dict, x: np.ndarray, y: np.ndarray):
    """Softmax cross-entropy loss (mean over batch) + grads for every
    parameter — manual BPTT, numerically validated."""
    B, T, _ = x.shape
    H = params["Wh"].shape[0]
    logits, cache = forward(params, x, want_cache=True)
    x_in, hs, steps, q, K, V, alpha, ctx, z1, a1 = cache

    shifted = logits - logits.max(axis=1, keepdims=True)
    expl = np.exp(shifted)
    probs = expl / expl.sum(axis=1, keepdims=True)
    n = B
    loss = -np.log(np.clip(probs[np.arange(n), y], 1e-12, None)).mean()

    g = {k: np.zeros_like(v) for k, v in params.items()}
    dlogits = probs.copy()
    dlogits[np.arange(n), y] -= 1.0
    dlogits /= n
    # FC head
    g["W2"] = a1.T @ dlogits
    g["b2"] = dlogits.sum(axis=0)
    da1 = dlogits @ params["W2"].T
    dz1 = da1 * (z1 > 0)
    g["W1"] = ctx.T @ dz1
    g["b1"] = dz1.sum(axis=0)
    dctx = dz1 @ params["W1"].T                        # (B, H)
    # attention backward
    dalpha = np.einsum("bh,bth->bt", dctx, V)          # (B, T)
    dV = alpha[:, :, None] * dctx[:, None, :]          # (B, T, H)
    dot = (dalpha * alpha).sum(axis=1, keepdims=True)
    dscores = alpha * (dalpha - dot)                   # softmax jacobian
    dscores /= np.sqrt(H)
    dq = np.einsum("bt,bth->bh", dscores, K)           # (B, H)
    dK = dscores[:, :, None] * q[:, None, :]           # (B, T, H)
    g["Wq"] = hs[:, -1].T @ dq
    g["Wk"] = np.einsum("bth,btk->hk", hs, dK)
    g["Wv"] = np.einsum("bth,btk->hk", hs, dV)
    dhs = dK @ params["Wk"].T + dV @ params["Wv"].T    # (B, T, H)
    dhs[:, -1] += dq @ params["Wq"].T
    # BPTT
    dh_next = np.zeros((B, H))
    dc_next = np.zeros((B, H))
    for t in range(T - 1, -1, -1):
        i, f, gate_g, o, c_prev, c, ct, _h, h_prev = steps[t]
        dh = dhs[:, t] + dh_next
        do = dh * ct
        dct = dh * o
        dc = dc_next + dct * (1.0 - ct * ct)
        di = dc * gate_g
        dg = dc * i
        df = dc * c_prev
        dc_next = dc * f
        dz = np.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - gate_g * gate_g),
                do * o * (1.0 - o),
            ],
            axis=1,
        )
        g["Wx"] += x_in[:, t].T @ dz
        g["Wh"] += h_prev.T @ dz
        g["b"] += dz.sum(axis=0)
        dh_next = dz @ params["Wh"].T
    return loss, g


def train_lstm(
    X: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    val: tuple[np.ndarray, np.ndarray] | None = None,
    hidden: int = 32,
    fc_hidden: int | None = None,
    epochs: int = 6,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 42,
) -> dict[str, np.ndarray]:
    """Adam over shuffled mini-batches; with ``val`` the returned params
    are the epoch checkpoint with the best validation accuracy — the
    reference's val-monitored training (lstm_forecasting.py epoch loop),
    expressed as epoch selection."""
    rng = np.random.default_rng(seed)
    params = init_params(rng, X.shape[2], hidden, n_classes, fc_hidden)
    m = {k: np.zeros_like(v) for k, v in params.items()}
    v_ad = {k: np.zeros_like(v) for k, v in params.items()}
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    step = 0
    best = None
    best_acc = -1.0
    n = X.shape[0]
    for _epoch in range(epochs):
        order = rng.permutation(n)
        for lo in range(0, n, batch_size):
            idx = order[lo : lo + batch_size]
            _loss, grads = loss_and_grads(params, X[idx], y[idx])
            step += 1
            for k in params:
                m[k] = beta1 * m[k] + (1 - beta1) * grads[k]
                v_ad[k] = beta2 * v_ad[k] + (1 - beta2) * grads[k] ** 2
                mh = m[k] / (1 - beta1**step)
                vh = v_ad[k] / (1 - beta2**step)
                params[k] = params[k] - lr * mh / (np.sqrt(vh) + eps)
        if val is not None:
            acc = float((predict(params, val[0]) == val[1]).mean())
            if acc > best_acc:
                best_acc = acc
                best = {k: p.copy() for k, p in params.items()}
    return best if best is not None else params


def predict(params: dict, X: np.ndarray, batch_size: int = 4096) -> np.ndarray:
    """Argmax labels, batched so huge inputs stay memory-bounded."""
    outs = []
    for lo in range(0, X.shape[0], batch_size):
        outs.append(forward(params, X[lo : lo + batch_size]).argmax(axis=1))
    return np.concatenate(outs) if outs else np.zeros(0, dtype=int)
