"""Library-free LSTM + self-attention regime predictor (M6/M7, no torch).

The reference topology (reference src/models/lstm_forecasting.py:16-34) is
``LSTM(hidden, num_layers, dropout=0.2) → nn.MultiheadAttention(hidden,
4 heads) → FC(hidden→hidden/2) → ReLU → FC(→classes)`` reading the
attention output at the LAST sequence position. torch is absent from this
container, so this module implements the full model class in pure numpy:

- stacked LSTM layers with inter-layer (inverted) dropout, exactly
  torch's ``nn.LSTM(dropout=...)`` placement — outputs of every layer
  except the last;
- multi-head self-attention WITH output projection (torch's in_proj +
  out_proj), computed with one query (the last hidden state): because the
  head only reads position -1, attention needs T scores per head, not
  T² — O(B·T·H) with output identical to full self-attention sliced at
  ``[:, -1]``;
- softmax cross-entropy, full manual backpropagation (BPTT through every
  layer and through the attention), Adam, validation-monitored epoch
  selection — the reference's 6-epoch/batch-32/Adam-1e-3 loop.

Gradients are numerically validated for EVERY parameter tensor in the
stacked multi-head configuration (tests/test_lstm_numpy.py).

Scale contract: Spark prepares features, windows and splits distributed
(shared with seq_mlp_classifier); TRAINING runs driver-side over the
collected train split — the reference's torch loop is equally single-node
— and INFERENCE is distributed (Arrow-batched pandas UDF with the trained
weights shipped in the closure, ml/forecasting.py
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


def _n_layers(params: dict) -> int:
    return sum(1 for k in params if k.startswith("Wx"))


def init_params(
    rng: np.random.Generator,
    n_features: int,
    hidden: int,
    n_classes: int,
    fc_hidden: int | None = None,
    n_layers: int = 1,
    n_heads: int = 1,
) -> dict[str, np.ndarray]:
    """Glorot-ish init; forget-gate bias starts at 1 (standard LSTM trick
    so early training does not forget everything). ``hidden`` must divide
    by ``n_heads`` (per-head key dim = hidden / n_heads)."""
    if hidden % n_heads:
        raise ValueError(f"hidden={hidden} must divide by n_heads={n_heads}")
    fc_hidden = fc_hidden or max(hidden // 2, 4)
    sh = 1.0 / np.sqrt(hidden)
    p: dict[str, np.ndarray] = {}
    in_dim = n_features
    for layer in range(n_layers):
        s_in = 1.0 / np.sqrt(in_dim)
        p[f"Wx{layer}"] = rng.normal(0, s_in, (in_dim, 4 * hidden))
        p[f"Wh{layer}"] = rng.normal(0, sh, (hidden, 4 * hidden))
        b = np.zeros(4 * hidden)
        b[hidden : 2 * hidden] = 1.0
        p[f"bl{layer}"] = b
        in_dim = hidden
    for name in ("Wq", "Wk", "Wv", "Wo"):
        p[name] = rng.normal(0, sh, (hidden, hidden))
    p["W1"] = rng.normal(0, sh, (hidden, fc_hidden))
    p["b1"] = np.zeros(fc_hidden)
    p["W2"] = rng.normal(0, 1.0 / np.sqrt(fc_hidden), (fc_hidden, n_classes))
    p["b2"] = np.zeros(n_classes)
    return p


def _lstm_layer_forward(Wx, Wh, b, x):
    """x (B,T,Din) → hs (B,T,H), per-step cache."""
    B, T, _ = x.shape
    H = Wh.shape[0]
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
        h_prev = h
        h = o * ct
        hs[:, t] = h
        steps.append((i, f, g, o, c_prev, ct, h_prev))
    return hs, steps


def _lstm_layer_backward(Wx, Wh, x, steps, dhs):
    """dhs (B,T,H) → (dWx, dWh, db, dx)."""
    B, T, _ = x.shape
    H = Wh.shape[0]
    dWx = np.zeros_like(Wx)
    dWh = np.zeros_like(Wh)
    db = np.zeros(4 * H)
    dx = np.zeros_like(x)
    dh_next = np.zeros((B, H))
    dc_next = np.zeros((B, H))
    for t in range(T - 1, -1, -1):
        i, f, g, o, c_prev, ct, h_prev = steps[t]
        dh = dhs[:, t] + dh_next
        do = dh * ct
        dct = dh * o
        dc = dc_next + dct * (1.0 - ct * ct)
        di = dc * g
        dg = dc * i
        df = dc * c_prev
        dc_next = dc * f
        dz = np.concatenate(
            [
                di * i * (1.0 - i),
                df * f * (1.0 - f),
                dg * (1.0 - g * g),
                do * o * (1.0 - o),
            ],
            axis=1,
        )
        dWx += x[:, t].T @ dz
        dWh += h_prev.T @ dz
        db += dz.sum(axis=0)
        dx[:, t] = dz @ Wx.T
        dh_next = dz @ Wh.T
    return dWx, dWh, db, dx


def forward(
    params: dict,
    x: np.ndarray,
    n_heads: int = 1,
    dropout: float = 0.0,
    rng: np.random.Generator | None = None,
    want_cache: bool = False,
):
    """x: (B, T, F) → logits (B, C). Dropout (inverted) applies between
    stacked LSTM layers only, and only when ``rng`` is given (training)."""
    B, T, _ = x.shape
    H = params["Wh0"].shape[0]
    n_layers = _n_layers(params)
    dk = H // n_heads
    layer_caches = []
    inp = x
    for layer in range(n_layers):
        hs, steps = _lstm_layer_forward(
            params[f"Wx{layer}"], params[f"Wh{layer}"], params[f"bl{layer}"], inp
        )
        mask = None
        out = hs
        if dropout > 0.0 and rng is not None and layer < n_layers - 1:
            mask = (rng.random(hs.shape) >= dropout) / (1.0 - dropout)
            out = hs * mask
        layer_caches.append((inp, steps, mask))
        inp = out
    hseq = inp  # (B, T, H) — last layer output (never dropped out)
    # multi-head attention, one query (last position)
    q_full = hseq[:, -1] @ params["Wq"]          # (B, H)
    K_full = hseq @ params["Wk"]                 # (B, T, H)
    V_full = hseq @ params["Wv"]                 # (B, T, H)
    q = q_full.reshape(B, n_heads, dk)
    K = K_full.reshape(B, T, n_heads, dk).transpose(0, 2, 1, 3)  # (B,nh,T,dk)
    V = V_full.reshape(B, T, n_heads, dk).transpose(0, 2, 1, 3)
    scores = np.einsum("bhd,bhtd->bht", q, K) / np.sqrt(dk)
    scores -= scores.max(axis=2, keepdims=True)
    alpha = np.exp(scores)
    alpha /= alpha.sum(axis=2, keepdims=True)    # (B, nh, T)
    ctx_h = np.einsum("bht,bhtd->bhd", alpha, V)  # (B, nh, dk)
    ctx = ctx_h.reshape(B, H)
    attn = ctx @ params["Wo"]
    z1 = attn @ params["W1"] + params["b1"]
    a1 = np.maximum(z1, 0.0)
    logits = a1 @ params["W2"] + params["b2"]
    if not want_cache:
        return logits
    cache = (x, layer_caches, hseq, q, K, V, alpha, ctx, z1, a1, n_heads)
    return logits, cache


def loss_and_grads(
    params: dict,
    x: np.ndarray,
    y: np.ndarray,
    n_heads: int = 1,
    dropout: float = 0.0,
    rng: np.random.Generator | None = None,
):
    """Softmax cross-entropy (mean over batch) + grads for every parameter
    — manual BPTT through the stack and the attention, numerically
    validated."""
    B, T, _ = x.shape
    H = params["Wh0"].shape[0]
    dk = H // n_heads
    logits, cache = forward(
        params, x, n_heads=n_heads, dropout=dropout, rng=rng, want_cache=True
    )
    _x, layer_caches, hseq, q, K, V, alpha, ctx, z1, a1, _nh = cache

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
    attn = ctx @ params["Wo"]
    g["W1"] = attn.T @ dz1
    g["b1"] = dz1.sum(axis=0)
    dattn = dz1 @ params["W1"].T                  # (B, H)
    g["Wo"] = ctx.T @ dattn
    dctx = (dattn @ params["Wo"].T).reshape(B, n_heads, dk)
    # attention backward (per head)
    dalpha = np.einsum("bhd,bhtd->bht", dctx, V)
    dV = alpha[:, :, :, None] * dctx[:, :, None, :]          # (B,nh,T,dk)
    dot = (dalpha * alpha).sum(axis=2, keepdims=True)
    dscores = alpha * (dalpha - dot) / np.sqrt(dk)           # (B,nh,T)
    dq = np.einsum("bht,bhtd->bhd", dscores, K)              # (B,nh,dk)
    dK = dscores[:, :, :, None] * q[:, :, None, :]           # (B,nh,T,dk)
    dq_full = dq.reshape(B, H)
    dK_full = dK.transpose(0, 2, 1, 3).reshape(B, T, H)
    dV_full = dV.transpose(0, 2, 1, 3).reshape(B, T, H)
    g["Wq"] = hseq[:, -1].T @ dq_full
    g["Wk"] = np.einsum("bth,btk->hk", hseq, dK_full)
    g["Wv"] = np.einsum("bth,btk->hk", hseq, dV_full)
    dhseq = dK_full @ params["Wk"].T + dV_full @ params["Wv"].T
    dhseq[:, -1] += dq_full @ params["Wq"].T
    # BPTT down the stack
    d_out = dhseq
    for layer in range(_n_layers(params) - 1, -1, -1):
        inp, steps, mask = layer_caches[layer]
        dhs = d_out if mask is None else d_out * mask
        dWx, dWh, db, dx = _lstm_layer_backward(
            params[f"Wx{layer}"], params[f"Wh{layer}"], inp, steps, dhs
        )
        g[f"Wx{layer}"] = dWx
        g[f"Wh{layer}"] = dWh
        g[f"bl{layer}"] = db
        d_out = dx
    return loss, g


def train_lstm(
    X: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    val: tuple[np.ndarray, np.ndarray] | None = None,
    hidden: int = 32,
    fc_hidden: int | None = None,
    n_layers: int = 1,
    n_heads: int = 1,
    dropout: float = 0.0,
    epochs: int = 6,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 42,
) -> dict[str, np.ndarray]:
    """Adam over shuffled mini-batches; with ``val`` the returned params
    are the epoch checkpoint with the best validation accuracy — the
    reference's val-monitored training (lstm_forecasting.py epoch loop),
    expressed as epoch selection. Dropout masks draw from the same seeded
    rng, so training is bit-deterministic per seed."""
    rng = np.random.default_rng(seed)
    params = init_params(
        rng, X.shape[2], hidden, n_classes, fc_hidden,
        n_layers=n_layers, n_heads=n_heads,
    )
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
            _loss, grads = loss_and_grads(
                params, X[idx], y[idx],
                n_heads=n_heads, dropout=dropout, rng=rng,
            )
            step += 1
            for k in params:
                m[k] = beta1 * m[k] + (1 - beta1) * grads[k]
                v_ad[k] = beta2 * v_ad[k] + (1 - beta2) * grads[k] ** 2
                mh = m[k] / (1 - beta1**step)
                vh = v_ad[k] / (1 - beta2**step)
                params[k] = params[k] - lr * mh / (np.sqrt(vh) + eps)
        if val is not None:
            acc = float((predict(params, val[0], n_heads=n_heads) == val[1]).mean())
            if acc > best_acc:
                best_acc = acc
                best = {k: p.copy() for k, p in params.items()}
    return best if best is not None else params


def predict(
    params: dict, X: np.ndarray, n_heads: int = 1, batch_size: int = 4096
) -> np.ndarray:
    """Argmax labels, batched so huge inputs stay memory-bounded; no
    dropout at inference (standard inverted-dropout semantics)."""
    outs = []
    for lo in range(0, X.shape[0], batch_size):
        outs.append(
            forward(params, X[lo : lo + batch_size], n_heads=n_heads).argmax(axis=1)
        )
    return np.concatenate(outs) if outs else np.zeros(0, dtype=int)
