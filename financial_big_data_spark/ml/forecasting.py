"""EP3: the LSTM regime-forecasting pipeline, Spark-side (SURVEY §3 EP3, M6-M8).

The reference trains an LSTM+attention classifier per symbol on 30-step
windows of 16 features (reference src/models/lstm_forecasting.py:15-35,
186-218, 227-302). The engine owns everything up to and after the model:

    bars → lstm_features (one window stage + MACD grouped-map)
         → label (next-hour regime = prediction target)
         → sequences (collect_list window)
         → ordered 70/15/15 split
         → model scoring → (true, pred) DataFrame
         → metrics (accuracy / F1 / confusion as aggregates)

The model itself is pluggable:

- **torch available** → train the reference topology on driver-collected
  train sequences (the per-symbol train set is small relative to cluster
  memory; TorchDistributor is the scale path) and score test rows via a
  pandas UDF.
- **torch absent** (this container) → four active paths:
  *persistence baseline* (predict the current regime continues — the
  standard no-model benchmark; with ~80% consolidation prevalence it
  reproduces the class-imbalance structure report.pdf p.9 §6.2 describes),
  distributed MLlib *logistic*, val-selected *mlp*/*seq_mlp* (the MLP on
  point-in-time features / on the flattened 30-step window), and **lstm**
  — the reference's ACTUAL topology (LSTM → self-attention → FC head)
  implemented library-free in numpy (ml/lstm_numpy.py: manual BPTT,
  Adam, val-monitored epochs; gradient-checked), trained driver-side like
  the reference's torch loop and scored distributed via pandas UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.features import FEATURE_COLS, lstm_features, ordered_split
from ..operators.regime import ShortTermThresholds, detect_regime_5way, regime_features
from .metrics import accuracy, confusion_matrix, per_class_f1, weighted_f1

try:  # pragma: no cover - torch is absent in the test container
    import torch  # noqa: F401

    HAS_TORCH = True
except ImportError:
    HAS_TORCH = False


@dataclass
class ForecastResult:
    predictions: DataFrame  # series, ts, true_label, pred_label, split
    accuracy: DataFrame
    weighted_f1: DataFrame
    per_class_f1: DataFrame
    confusion: DataFrame

    def unpersist(self) -> None:
        """Release the plan-level caches this pipeline pinned.

        The pipeline registers its persists through
        ``cache.tracked_persist``, so this delegates to
        ``cache.release_tracked()`` — which releases ALL tracked plan
        caches in the session (the documented bulk-release contract;
        the query registry and bench already call it between queries).
        Materialize (collect/write) every result you need BEFORE calling.
        """
        from ..cache import release_tracked

        release_tracked()


def regime_prediction_dataset(
    bars: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    close: str = "close",
    high: str = "high",
    low: str = "low",
    volume: str = "volume",
    thresholds: ShortTermThresholds | None = None,
    order_tiebreak: list[str] | None = None,
    macd_buckets: int | None = None,
) -> DataFrame:
    """Features + current regime + next-step target label, one pipeline.

    The label is ``lead(regime)`` — predicting the NEXT bar's regime
    (reference lstm_forecasting.py:205-208 shifts labels by one).
    """
    order = [time] + (order_tiebreak or [])
    w = Window.partitionBy(series).orderBy(*[F.col(c) for c in order])
    feats = lstm_features(
        bars, series=series, time=time, close=close, high=high, low=low, volume=volume,
        order_tiebreak=order_tiebreak, macd_buckets=macd_buckets,
    )
    labeled = detect_regime_5way(
        regime_features(
            feats, series=series, time=time, close=close, volume=volume,
            order_tiebreak=order_tiebreak,
        ),
        thresholds or ShortTermThresholds(),
    )
    return labeled.withColumn("target_regime", F.lead("regime").over(w)).where(
        F.col("target_regime").isNotNull()
    )


def persistence_baseline(dataset: DataFrame) -> DataFrame:
    """No-model benchmark: predict the current regime persists."""
    return dataset.select(
        "*",
        F.col("target_regime").alias("true_label"),
        F.col("regime").alias("pred_label"),
    )


def mllib_regime_classifier(
    dataset: DataFrame,
    feature_cols: list[str] | None = None,
    max_iter: int = 40,
    reg_param: float = 0.01,
    model: str = "logistic",
    hidden_layers: tuple[int, ...] = (4,),
    seed: int = 42,
) -> DataFrame:
    """Distributed trainable model path (no torch needed), trained on the
    train split and scored everywhere.

    ``model``:

    - ``"logistic"`` — multinomial logistic regression (LBFGS).
    - ``"mlp"`` — ``MultilayerPerceptronClassifier`` with ``hidden_layers``
      between the feature block and the class outputs: the closest
      torch-free approximation of the reference's model CLASS (a nonlinear
      neural net over the same windowed features; reference
      lstm_forecasting.py:15-35 — recurrence is the one part MLlib can't
      express).

    This is the M6/M7 slot done Spark-native — both trainers run as Spark
    jobs over the training rows, so the same code trains on a 1000-executor
    cluster. The LSTM topology (torch) remains the pluggable upgrade; the
    evaluation protocol (test-split metrics) is identical either way.
    Returns dataset + pred_label.
    """
    from pyspark.ml.classification import (
        LogisticRegression,
        MultilayerPerceptronClassifier,
    )
    from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler

    feature_cols = feature_cols or FEATURE_COLS
    # the feature pipeline above this point is expensive (16 window features
    # + regime labeling + grouped-map MACD) and is re-read by the indexer
    # fit, the LBFGS fit and the scoring pass — persist once (tracked:
    # released by cache.release_tracked between registry queries)
    from ..cache import tracked_persist

    dataset = tracked_persist(dataset)
    # the CURRENT regime is part of the model's input (one-hot): the task is
    # P(next regime | current regime, features) and regimes are sticky, so a
    # model blind to the current label can't even represent the persistence
    # map — the reference's windowed sequences encode it implicitly
    # (lstm_forecasting.py:186-192; the regime label is a deterministic
    # function of the windowed features)
    reg_idx = StringIndexer(inputCol="regime", outputCol="_regime_idx").fit(dataset)
    n_reg = len(reg_idx.labelsArray[0])
    ohe = OneHotEncoder(
        inputCols=["_regime_idx"], outputCols=["_regime_oh"], dropLast=False
    )
    with_reg = ohe.fit(reg_idx.transform(dataset)).transform(reg_idx.transform(dataset))
    assembler = VectorAssembler(
        inputCols=[*feature_cols, "_regime_oh"], outputCol="_fv", handleInvalid="keep"
    )
    indexer = StringIndexer(inputCol="target_regime", outputCol="_label", handleInvalid="keep")
    idx_model = indexer.fit(with_reg)
    prepared = idx_model.transform(assembler.transform(with_reg))
    features_col = "_fv"
    if model == "mlp":
        # MLP has no internal standardization (LogisticRegression does):
        # raw-scale features like RSI (0-100) saturate the sigmoid units
        # and gradient descent stalls. Scale stats come from the TRAIN
        # split only (no test leakage).
        from pyspark.ml.feature import StandardScaler

        scaler = StandardScaler(
            inputCol="_fv", outputCol="_fv_std", withMean=True, withStd=True
        ).fit(prepared.where(F.col("split") == "train"))
        prepared = scaler.transform(prepared)
        features_col = "_fv_std"
    train = prepared.where(F.col("split") == "train")
    n_classes = len(idx_model.labelsArray[0])
    if model == "mlp":
        # M7 training loop: MLlib's MLP exposes no regularization, so the
        # levers are capacity (narrow hidden bottleneck) and early stopping
        # — selected on the VAL split over a small deterministic grid of
        # (seed, iteration-budget) candidates, mirroring the reference's
        # val-monitored epoch loop (lstm_forecasting.py:244-266). Each
        # candidate trains as Spark jobs over the cached prepared frame;
        # the val scores are one tiny aggregate per candidate.
        prepared = tracked_persist(prepared)
        train = prepared.where(F.col("split") == "train")
        val = prepared.where(F.col("split") == "val")
        layers = [len(feature_cols) + n_reg, *hidden_layers, n_classes]
        grid = [
            (cand_seed, iters)
            for cand_seed in (seed, seed + 1, seed + 2)
            for iters in dict.fromkeys([max(max_iter // 2, 5), max_iter])
        ]

        # candidates fit CONCURRENTLY: each fit is a chain of Spark jobs
        # the scheduler interleaves across threads, so the cluster stays
        # busy through every candidate's per-iteration barriers (the same
        # pattern as the EP2 branch fan-out). Selection is deterministic:
        # ties break on grid order, not thread completion order.
        def fit_one(cand_seed: int, iters: int):
            cand = MultilayerPerceptronClassifier(
                featuresCol=features_col, labelCol="_label", layers=layers,
                maxIter=iters, seed=cand_seed,
            ).fit(train)
            acc_row = (
                cand.transform(val)
                .agg(F.avg((F.col("prediction") == F.col("_label")).cast("double")))
                .collect()[0][0]
            )
            return cand, acc_row

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=len(grid)) as pool:
            results = list(pool.map(lambda g: fit_one(*g), grid))
        best_fit, best_acc = None, -1.0
        for cand, acc_row in results:
            if acc_row is not None and acc_row > best_acc:
                best_fit, best_acc = cand, acc_row
        fitted = best_fit
    else:
        clf = LogisticRegression(
            featuresCol="_fv", labelCol="_label", maxIter=max_iter, regParam=reg_param,
            family="multinomial",
        )
        fitted = clf.fit(train)
    scored = fitted.transform(prepared)
    labels = idx_model.labelsArray[0]
    mapping = F.array(*[F.lit(x) for x in labels])
    out = scored.withColumn(
        "pred_label",
        F.when(
            F.col("prediction").cast("int") < len(labels),
            mapping[F.col("prediction").cast("int")],
        ).otherwise(F.lit(labels[0])),
    )
    return out.drop(
        "_fv", "_fv_std", "_label", "_regime_idx", "_regime_oh",
        "rawPrediction", "probability", "prediction",
    )


def _scaled_windows(
    dataset: DataFrame,
    series: str,
    time: str,
    feature_cols: list[str],
    seq_len: int,
    order_tiebreak: list[str] | None,
) -> DataFrame:
    """Shared sequence prep for the windowed model paths (seq_mlp, lstm):
    train-split standardization as Column arithmetic, then the
    ``seq_len``-step flattened feature window per (series, time) —
    scale-first-window-second per the reference (lstm_forecasting.py:
    171-218); only rows with complete windows survive. The input is
    persisted (tracked) because the stats aggregate and the main pass both
    execute its lineage."""
    from ..cache import tracked_persist

    dataset = tracked_persist(dataset)
    stats = (
        dataset.where(F.col("split") == "train")
        .agg(
            *[F.avg(c).alias(f"_m_{c}") for c in feature_cols],
            *[F.stddev_samp(c).alias(f"_s_{c}") for c in feature_cols],
        )
        .collect()[0]
    )
    scaled = [
        (
            (F.col(c) - F.lit(float(stats[f"_m_{c}"] or 0.0)))
            / F.lit(float(stats[f"_s_{c}"]) if stats[f"_s_{c}"] else 1.0)
        )
        for c in feature_cols
    ]
    order = [time] + (order_tiebreak or [])
    w = (
        Window.partitionBy(series)
        .orderBy(*[F.col(c) for c in order])
        .rowsBetween(-(seq_len - 1), 0)
    )
    return dataset.withColumn(
        "_seq", F.flatten(F.collect_list(F.array(*scaled)).over(w))
    ).where(F.size("_seq") == seq_len * len(feature_cols))


def distributed_grad_step(
    shards: DataFrame,
    params: dict,
    n_heads: int,
    seq_len: int,
    n_feat: int,
) -> tuple[float, dict, int]:
    """One synchronous data-parallel gradient: every partition computes
    its shard's (loss·b, grads·b, b) with the broadcast parameters, a
    treeReduce sums them, and the driver divides by the global batch size
    — EXACTLY the full-batch gradient (the loss is a mean, so per-shard
    mean·b sums to batch-sum; pinned to the driver-side gradient at 1e-12
    in tests). ``shards`` must hold (_seq array, _y int) rows.

    This is the library-free analogue of synchronous data-parallel
    training (one allreduce per step): gradients travel, data does not —
    the collect-free scale path for the numpy LSTM.
    """
    from .lstm_numpy import loss_and_grads

    sc = shards.sparkSession.sparkContext
    bc = sc.broadcast({k: v for k, v in params.items()})

    def part(rows):
        buf = list(rows)
        if not buf:
            return
        X = np.array([r["_seq"] for r in buf], dtype=np.float64).reshape(
            len(buf), seq_len, n_feat
        )
        y = np.array([r["_y"] for r in buf], dtype=int)
        loss, g = loss_and_grads(bc.value, X, y, n_heads=n_heads)
        b = len(buf)
        yield (loss * b, {k: v * b for k, v in g.items()}, b)

    def merge(a, b):
        return (
            a[0] + b[0],
            {k: a[1][k] + b[1][k] for k in a[1]},
            a[2] + b[2],
        )

    parts = shards.rdd.mapPartitions(part)
    total = parts.treeReduce(merge)
    bc.unpersist()
    loss_sum, grad_sum, n = total
    return loss_sum / n, {k: v / n for k, v in grad_sum.items()}, n


def train_lstm_distributed(
    prepared: DataFrame,
    label_idx: dict,
    seq_len: int,
    n_feat: int,
    hidden: int = 32,
    n_layers: int = 1,
    n_heads: int = 1,
    epochs: int = 6,
    rounds_per_epoch: int = 4,
    lr: float = 1e-3,
    seed: int = 42,
) -> dict:
    """Distributed synchronous large-batch Adam for the numpy LSTM: the
    train split never leaves the executors. Each epoch is split into
    ``rounds_per_epoch`` deterministic disjoint mega-batches (md5 hash of
    the epoch/seed and a per-row id — layout-invariant), each consumed by
    one ``distributed_grad_step``; Adam updates run driver-side on the
    aggregated gradient. Dropout is not applied here (mask locality under
    repartitioning is undefined); regularize via capacity instead.
    """
    from .lstm_numpy import init_params

    rng = np.random.default_rng(seed)
    params = init_params(
        rng, n_feat, hidden, len(label_idx), n_layers=n_layers, n_heads=n_heads
    )
    m = {k: np.zeros_like(v) for k, v in params.items()}
    v_ad = {k: np.zeros_like(v) for k, v in params.items()}
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    step = 0
    from ..cache import tracked_persist

    train = tracked_persist(prepared.select("_seq", "_y", "_rid"))
    for epoch in range(epochs):
        bucket = F.pmod(
            F.abs(F.xxhash64(F.concat_ws(":", F.lit(seed + epoch), F.col("_rid")))),
            F.lit(rounds_per_epoch),
        )
        for r in range(rounds_per_epoch):
            shard = train.where(bucket == r)
            _loss, grads, n = distributed_grad_step(
                shard, params, n_heads, seq_len, n_feat
            )
            if n == 0:
                continue
            step += 1
            for k in params:
                m[k] = beta1 * m[k] + (1 - beta1) * grads[k]
                v_ad[k] = beta2 * v_ad[k] + (1 - beta2) * grads[k] ** 2
                mh = m[k] / (1 - beta1**step)
                vh = v_ad[k] / (1 - beta2**step)
                params[k] = params[k] - lr * mh / (np.sqrt(vh) + eps)
    return params


def lstm_regime_classifier(
    dataset: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    feature_cols: list[str] | None = None,
    seq_len: int = 30,
    hidden: int = 32,
    n_layers: int = 1,
    n_heads: int = 1,
    dropout: float = 0.0,
    epochs: int = 6,
    batch_size: int = 32,
    lr: float = 1e-3,
    seed: int = 42,
    order_tiebreak: list[str] | None = None,
    distributed: bool = False,
) -> DataFrame:
    """M6/M7 proper: the reference's LSTM + self-attention topology
    (lstm_forecasting.py:16-34 — stacked LSTM with inter-layer dropout →
    multi-head attention with output projection → ReLU FC head on the
    last position, 6 epochs, batch 32, Adam 1e-3) implemented library-free
    in numpy (ml/lstm_numpy.py). The reference's exact configuration is
    ``hidden=128, n_layers=2, n_heads=4, dropout=0.2``; the defaults here
    are sized down for CPU-only training time — capacity is the exposed
    knob, the topology is the reference's at any setting.

    Division of labor at scale: feature windows and splits are built
    DISTRIBUTED (shared ``_scaled_windows`` machinery); by default
    training collects the train/val splits driver-side — exactly as
    single-node as the reference's torch loop, with val-monitored epoch
    selection. With ``distributed=True`` training itself goes
    data-parallel (``train_lstm_distributed``): the train split never
    leaves the executors, each synchronous step aggregates per-partition
    gradients (treeReduce "allreduce") and Adam updates run driver-side —
    the collect-free scale route (dropout unsupported there; the
    per-shard gradient sum is pinned EXACTLY equal to the driver
    full-batch gradient in tests). INFERENCE always runs distributed
    through an Arrow-batched pandas UDF with the trained weights shipped
    in the closure (same seam a torch/GPU model swaps into).
    """
    from ..cache import tracked_persist
    from .lstm_numpy import forward as _lstm_forward
    from .lstm_numpy import train_lstm

    feature_cols = feature_cols or FEATURE_COLS
    n_feat = len(feature_cols)
    prepared = tracked_persist(
        _scaled_windows(dataset, series, time, feature_cols, seq_len, order_tiebreak)
    )
    labels = sorted(
        r[0]
        for r in prepared.select("target_regime").distinct().collect()
        if r[0] is not None
    )
    label_idx = {lab: i for i, lab in enumerate(labels)}

    def _collect(split: str):
        rows = (
            prepared.where(F.col("split") == split)
            .select("_seq", "target_regime")
            .collect()
        )
        if not rows:
            return np.zeros((0, seq_len, n_feat)), np.zeros(0, dtype=int)
        X = np.array([r["_seq"] for r in rows], dtype=np.float64).reshape(
            len(rows), seq_len, n_feat
        )
        y = np.array([label_idx[r["target_regime"]] for r in rows], dtype=int)
        return X, y

    if distributed:
        if dropout:
            raise ValueError("dropout is unsupported with distributed=True")
        lab_map = F.create_map(
            *[F.lit(x) for kv in label_idx.items() for x in kv]
        )
        shards = prepared.where(F.col("split") == "train").select(
            "_seq",
            lab_map[F.col("target_regime")].cast("int").alias("_y"),
            F.concat_ws("#", F.col(series).cast("string"), F.col(time).cast("string")).alias("_rid"),
        )
        params = train_lstm_distributed(
            shards, label_idx, seq_len, n_feat,
            hidden=hidden, n_layers=n_layers, n_heads=n_heads,
            epochs=epochs, lr=lr, seed=seed,
        )
    else:
        Xtr, ytr = _collect("train")
        Xval, yval = _collect("val")
        params = train_lstm(
            Xtr, ytr, n_classes=len(labels),
            val=(Xval, yval) if len(yval) else None,
            hidden=hidden, n_layers=n_layers, n_heads=n_heads, dropout=dropout,
            epochs=epochs, batch_size=batch_size, lr=lr, seed=seed,
        )

    @F.pandas_udf("string")
    def _score(seqs: pd.Series) -> pd.Series:
        if seqs.empty:
            return pd.Series([], dtype=str)
        X = np.array(list(seqs), dtype=np.float64).reshape(-1, seq_len, n_feat)
        pred = _lstm_forward(params, X, n_heads=n_heads).argmax(axis=1)
        return pd.Series([labels[j] for j in pred])

    return prepared.withColumn("pred_label", _score(F.col("_seq"))).drop("_seq")


def seq_mlp_classifier(
    dataset: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    feature_cols: list[str] | None = None,
    seq_len: int = 30,
    hidden_layers: tuple[int, ...] = (32,),
    max_iter: int = 40,
    seed: int = 42,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """M6/M7 with the reference's MODEL INPUT: the flattened ``seq_len``-step
    window of the feature block (reference lstm_forecasting.py:186-192
    builds (n, 30, 16) sequences; the MLP consumes the same window
    flattened to seq_len·16 inputs — recurrence is the one part MLlib
    cannot express, so the sequence content enters positionally).

    Faithful to the reference's order of operations
    (lstm_forecasting.py:171-218):

    - **scale first, window second**: per-feature mean/std standardize
      each feature as Column arithmetic BEFORE the window (train-split
      stats only — 2·k driver-side scalars; stricter than the reference,
      which fits its scaler on the full series).
    - **windows span the full series**: the reference builds sequences
      over the whole series FIRST and slices the sequence list
      positionally (create_sequences + positional split, :186-218), so a
      val/test window legitimately reaches back into earlier-period
      history — only the LABEL row (already split by ordered_split)
      determines membership. No label leakage: a train-labeled window
      never sees post-train rows. Only the first seq_len−1 rows of each
      series drop.
    - **val-selected capacity/stopping**: same concurrent (seed, iters)
      grid as the point-in-time MLP path, picked on val accuracy.

    Returns dataset rows having complete windows, plus ``pred_label``.
    """
    from pyspark.ml.classification import MultilayerPerceptronClassifier
    from pyspark.ml.feature import StringIndexer
    from pyspark.ml.functions import array_to_vector

    from ..cache import tracked_persist

    feature_cols = feature_cols or FEATURE_COLS
    with_seq = _scaled_windows(
        dataset, series, time, feature_cols, seq_len, order_tiebreak
    )
    prepared = tracked_persist(with_seq.withColumn("_fv", array_to_vector("_seq")))
    idx_model = StringIndexer(
        inputCol="target_regime", outputCol="_label", handleInvalid="keep"
    ).fit(prepared)
    indexed = idx_model.transform(prepared)
    train = indexed.where(F.col("split") == "train")
    val = indexed.where(F.col("split") == "val")
    n_classes = len(idx_model.labelsArray[0])
    layers = [seq_len * len(feature_cols), *hidden_layers, n_classes]
    grid = [
        (cand_seed, iters)
        for cand_seed in (seed, seed + 1, seed + 2)
        for iters in dict.fromkeys([max(max_iter // 2, 5), max_iter])
    ]

    def fit_one(cand_seed: int, iters: int):
        cand = MultilayerPerceptronClassifier(
            featuresCol="_fv", labelCol="_label", layers=layers,
            maxIter=iters, seed=cand_seed,
        ).fit(train)
        acc_row = (
            cand.transform(val)
            .agg(F.avg((F.col("prediction") == F.col("_label")).cast("double")))
            .collect()[0][0]
        )
        return cand, acc_row

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(grid)) as pool:
        results = list(pool.map(lambda g: fit_one(*g), grid))
    best_fit, best_acc = None, -1.0
    for cand, acc_row in results:
        if acc_row is not None and acc_row > best_acc:
            best_fit, best_acc = cand, acc_row
    labels = idx_model.labelsArray[0]
    mapping = F.array(*[F.lit(x) for x in labels])
    out = best_fit.transform(indexed).withColumn(
        "pred_label",
        F.when(
            F.col("prediction").cast("int") < len(labels),
            mapping[F.col("prediction").cast("int")],
        ).otherwise(F.lit(labels[0])),
    )
    return out.drop(
        "_seq", "_fv", "_label", "rawPrediction", "probability", "prediction"
    )


def batch_score(
    dataset: DataFrame,
    coefficients,
    intercept,
    labels: list[str],
    feature_cols: list[str] | None = None,
    batch_size: int = 1024,
    out: str = "pred_label",
) -> DataFrame:
    """M6 distributed-inference seam: score rows through
    ``pyspark.ml.functions.predict_batch_udf`` — the exact path a torch
    LSTM would use in production (model materialized once per executor,
    Arrow/NumPy batches in, labels out; reference scores with
    ``model(X_test)`` on a collected array, lstm_forecasting.py:283-287).

    The scorer here is a NumPy linear classifier (e.g. the coefficient
    matrix of the MLlib logistic model — parity-tested against MLlib's own
    transform); a torch model swaps in by replacing ``make_predict_fn``'s
    body with ``torch.load`` + forward pass. Nothing else changes: same UDF,
    same batching, same (features array → label) contract.
    """
    import numpy as np
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql.types import StringType

    feature_cols = feature_cols or FEATURE_COLS
    W = np.asarray(coefficients, dtype=np.float64)
    b = np.asarray(intercept, dtype=np.float64)
    labs = list(labels)

    def make_predict_fn():
        lab_arr = np.array(labs)

        def predict(inputs: np.ndarray) -> np.ndarray:
            logits = inputs @ W.T + b
            return lab_arr[np.argmax(logits, axis=1)]

        return predict

    udf = predict_batch_udf(
        make_predict_fn,
        return_type=StringType(),
        batch_size=batch_size,
        input_tensor_shapes=[[len(feature_cols)]],
    )
    features = F.array(*[F.col(c).cast("double") for c in feature_cols])
    return dataset.withColumn(out, udf(features))


def batch_score_mlp(
    dataset: DataFrame,
    layers: list[int],
    weights,
    labels: list[str],
    feature_cols: list[str] | None = None,
    batch_size: int = 1024,
    out: str = "pred_label",
    regime_col: str | None = None,
    regime_labels: list[str] | None = None,
    scaler_mean=None,
    scaler_std=None,
) -> DataFrame:
    """The same ``predict_batch_udf`` seam as :func:`batch_score`, for the
    MLP: a NumPy forward pass over MLlib's flat weight vector.

    MLlib's feed-forward topology stores, per affine layer, the weight
    matrix (column-major, ``n_out`` × ``n_in``) followed by the bias;
    hidden activations are sigmoid and the output layer is softmax —
    argmax is taken on the logits (softmax is monotonic). Parity with
    ``MultilayerPerceptronClassificationModel.transform`` is pinned in
    tests; a torch LSTM swaps in by replacing the forward body.

    With only ``feature_cols``, the seam expects a RAW-FEATURE MLP (one
    trained directly on the unscaled feature vector). The production
    training path (``mllib_regime_classifier(model='mlp')``) trains on
    ``[features + current-regime one-hot]`` THEN StandardScaler — to
    round-trip weights from that path (ADVICE r3), pass:

    - ``regime_col`` + ``regime_labels`` (the fitted StringIndexer's label
      order): appends the one-hot block in index order, and
    - ``scaler_mean`` / ``scaler_std`` (the fitted StandardScalerModel's
      ``mean``/``std`` arrays over the ASSEMBLED vector): standardizes
      inside the UDF before the forward pass — ``(x − mean) · (1/std)``
      with zero-variance dims zeroed, exactly MLlib's formula.
    """
    import numpy as np
    from pyspark.ml.functions import predict_batch_udf
    from pyspark.sql.types import StringType

    feature_cols = feature_cols or FEATURE_COLS
    flat = np.asarray(weights, dtype=np.float64)
    mats: list[tuple] = []
    pos = 0
    for n_in, n_out in zip(layers[:-1], layers[1:]):
        w = flat[pos : pos + n_in * n_out].reshape(n_in, n_out)
        pos += n_in * n_out
        b = flat[pos : pos + n_out]
        pos += n_out
        mats.append((w, b))
    labs = list(labels)
    n_inputs = len(feature_cols) + (len(regime_labels) if regime_labels else 0)
    mu = np.asarray(scaler_mean, dtype=np.float64) if scaler_mean is not None else None
    fac = None
    if scaler_std is not None:
        sd = np.asarray(scaler_std, dtype=np.float64)
        fac = np.where(sd != 0.0, 1.0 / np.where(sd != 0.0, sd, 1.0), 0.0)

    def make_predict_fn():
        lab_arr = np.array(labs)

        def predict(inputs: np.ndarray) -> np.ndarray:
            x = inputs.astype(np.float64)
            if mu is not None:
                x = x - mu
            if fac is not None:
                x = x * fac
            for i, (w, b) in enumerate(mats):
                x = x @ w + b
                if i < len(mats) - 1:
                    x = 1.0 / (1.0 + np.exp(-x))
            return lab_arr[np.argmax(x, axis=1)]

        return predict

    udf = predict_batch_udf(
        make_predict_fn,
        return_type=StringType(),
        batch_size=batch_size,
        input_tensor_shapes=[[n_inputs]],
    )
    parts = [F.col(c).cast("double") for c in feature_cols]
    if regime_labels:
        parts += [
            (F.col(regime_col) == F.lit(lab)).cast("double")
            for lab in regime_labels
        ]
    return dataset.withColumn(out, udf(F.array(*parts)))


def forecast_and_evaluate(
    bars: DataFrame,
    series: str = "symbol",
    time: str = "ts",
    close: str = "close",
    high: str = "high",
    low: str = "low",
    volume: str = "volume",
    model: str = "baseline",
    order_tiebreak: list[str] | None = None,
    macd_buckets: int | None = None,
    seq_len: int = 30,
) -> ForecastResult:
    """End-to-end EP3: dataset → split → score → metrics.

    ``model``: "baseline" (persistence), "logistic" (distributed MLlib
    multinomial LR), "mlp" (MultilayerPerceptronClassifier on
    point-in-time features + current-regime one-hot), "seq_mlp" (the
    same classifier on the reference's model input — the flattened
    30-step feature window, lstm_forecasting.py:186-192), "lstm" (the
    reference's LSTM+attention topology, library-free numpy —
    ml/lstm_numpy.py) or "lstm_dist" (same topology, data-parallel
    synchronous training — the train split never leaves the
    executors). All trained on the train split; metrics are
    computed on the test split only, per the reference's evaluation
    protocol (lstm_forecasting.py:288-302).

    CACHE LIFETIME: the pipeline pins intermediate frames via
    ``cache.tracked_persist``; library callers should call
    ``result.unpersist()`` after materializing what they need (the query
    registry and bench bulk-release between queries automatically).
    """
    ds = regime_prediction_dataset(
        bars, series=series, time=time, close=close, high=high, low=low,
        volume=volume, order_tiebreak=order_tiebreak, macd_buckets=macd_buckets,
    )
    ds = ordered_split(ds, series=series, time=time, order_tiebreak=order_tiebreak)
    if model in ("lstm", "lstm_dist"):
        scored = lstm_regime_classifier(
            ds, series=series, time=time, order_tiebreak=order_tiebreak,
            seq_len=seq_len, distributed=(model == "lstm_dist"),
        ).withColumn("true_label", F.col("target_regime"))
    elif model == "seq_mlp":
        scored = seq_mlp_classifier(
            ds, series=series, time=time, order_tiebreak=order_tiebreak,
            seq_len=seq_len,
        ).withColumn("true_label", F.col("target_regime"))
    elif model in ("logistic", "mlp"):
        scored = mllib_regime_classifier(ds, model=model).withColumn(
            "true_label", F.col("target_regime")
        )
    else:
        scored = persistence_baseline(ds)
    # every metric frame re-reads the scored test split — cache it so the
    # feature pipeline (incl. the grouped-map MACD) computes once, not once
    # per metric action (tracked: bulk-released between registry queries)
    from ..cache import tracked_persist

    test = tracked_persist(
        scored.where(F.col("split") == "test")
        .select(series, time, "true_label", "pred_label", "split")
    )
    return ForecastResult(
        predictions=test,
        accuracy=accuracy(test),
        weighted_f1=weighted_f1(test),
        per_class_f1=per_class_f1(test),
        confusion=confusion_matrix(test),
    )
