"""EP3 forecasting pipeline: dataset, baseline scoring, metric protocol."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.ml.forecasting import (
    HAS_TORCH,
    forecast_and_evaluate,
    persistence_baseline,
    regime_prediction_dataset,
)


def test_dataset_has_shifted_target(spark, bars_df, bars_pdf):
    ds = regime_prediction_dataset(bars_df)
    # one row dropped per series (last row has no next regime)
    assert ds.count() == len(bars_pdf) - bars_pdf["symbol"].nunique()
    # target equals the next row's regime
    rows = (
        ds.where("symbol = 'AAA/USDT'")
        .orderBy("ts")
        .select("regime", "target_regime")
        .collect()
    )
    for cur, nxt in zip(rows, rows[1:]):
        assert cur.target_regime == nxt.regime


def test_persistence_baseline_accuracy_is_regime_stability(spark, bars_df):
    ds = regime_prediction_dataset(bars_df)
    scored = persistence_baseline(ds)
    acc = scored.agg(
        F.avg((F.col("true_label") == F.col("pred_label")).cast("double")).alias("a")
    ).collect()[0].a
    # persistence accuracy == P(regime unchanged next hour); regimes are runs,
    # so this is high but below 1 on the nondegenerate fixture
    assert 0.5 < acc < 1.0


def test_forecast_and_evaluate_end_to_end(spark, bars_df):
    res = forecast_and_evaluate(bars_df)
    acc_row = res.accuracy.collect()[0]
    assert 0.0 <= acc_row.accuracy <= 1.0
    assert acc_row.n == res.predictions.count()
    # test split only
    assert res.predictions.where("split != 'test'").count() == 0
    # per-class f1 covers every label present in the test predictions
    labels_pred = {
        r.true_label for r in res.predictions.select("true_label").distinct().collect()
    }
    labels_f1 = {r.label for r in res.per_class_f1.collect()}
    assert labels_pred <= labels_f1
    wf1 = res.weighted_f1.collect()[0].weighted_f1
    assert 0.0 <= wf1 <= 1.0


def test_torch_flag_reflects_environment():
    assert HAS_TORCH is False  # this container ships no torch; baseline path


def test_mllib_logistic_model_path(spark, bars_df):
    res = forecast_and_evaluate(bars_df, model="logistic")
    acc = res.accuracy.collect()[0]
    assert 0.0 <= acc.accuracy <= 1.0 and acc.n > 0
    # trained model must beat uniform-random guessing over 5 classes
    assert acc.accuracy > 0.2
    preds = {r.pred_label for r in res.predictions.select("pred_label").distinct().collect()}
    assert preds <= {
        "stable_bull", "volatile_bull", "stable_bear", "volatile_bear", "consolidation"
    }


def test_predict_batch_udf_scoring_seam(spark, bars_df):
    """M6 distributed-inference seam: the predict_batch_udf path must
    reproduce MLlib's own transform predictions exactly (same linear math,
    executor-side batched scoring), with the (series, ts, true, pred)
    output schema the metrics protocol consumes."""
    import numpy as np
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StringIndexer, VectorAssembler

    from financial_big_data_spark.ml.forecasting import batch_score
    from financial_big_data_spark.operators.features import FEATURE_COLS, ordered_split

    ds = regime_prediction_dataset(bars_df)
    ds = ordered_split(ds, series="symbol", time="ts")
    ds = ds.fillna(0.0, subset=FEATURE_COLS).cache()

    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="_fv")
    indexer = StringIndexer(inputCol="target_regime", outputCol="_label", handleInvalid="keep")
    idx_model = indexer.fit(ds)
    prepared = idx_model.transform(assembler.transform(ds))
    lr = LogisticRegression(
        featuresCol="_fv", labelCol="_label", maxIter=20, regParam=0.01,
        family="multinomial",
    )
    model = lr.fit(prepared.where("split = 'train'"))
    labels = list(idx_model.labelsArray[0])

    # MLlib's own scoring of the test split
    test = prepared.where("split = 'test'")
    mllib_scored = model.transform(test).select(
        "symbol", "ts", F.col("target_regime").alias("true_label"),
        F.col("prediction").cast("int").alias("_pred_idx"),
    )
    expected = {
        (r.symbol, r.ts): labels[r._pred_idx] for r in mllib_scored.collect()
    }

    # same weights through the predict_batch_udf seam
    W = model.coefficientMatrix.toArray()
    b = np.array(model.interceptVector.toArray())
    scored = batch_score(
        test, W, b, labels, feature_cols=FEATURE_COLS, batch_size=64
    ).select("symbol", "ts", F.col("target_regime").alias("true_label"), "pred_label")

    rows = scored.collect()
    assert len(rows) == len(expected) > 0
    assert set(scored.columns) == {"symbol", "ts", "true_label", "pred_label"}
    for r in rows:
        assert r.pred_label == expected[(r.symbol, r.ts)], (r.symbol, r.ts)
    ds.unpersist()


def test_mllib_mlp_model_path(spark, bars_df):
    """The nonlinear torch-free stand-in (M6/M7): the val-selected MLP must
    crush the majority-class baseline and sit at the persistence ceiling.

    On this fixture the test split has 138 rows and persistence scores
    0.8695 — regime stickiness IS the signal, so persistence prevalence is
    within one row of the Bayes ceiling; measured across seeds the MLP
    lands 0.84-0.88. The assertions pin: (a) ≥ 2× the majority-class
    prevalence (the reference's own comparison frame, report.pdf §6.2),
    (b) within 0.05 of persistence (ties it within test-split noise)."""
    base = forecast_and_evaluate(bars_df)
    mlp = forecast_and_evaluate(bars_df, model="mlp")
    acc_base = base.accuracy.collect()[0].accuracy
    acc_mlp = mlp.accuracy.collect()[0].accuracy
    counts = {
        r.true_label: r["count"]
        for r in mlp.predictions.groupBy("true_label").count().collect()
    }
    majority = max(counts.values()) / sum(counts.values())
    assert acc_mlp >= 2 * majority - 0.05, (acc_mlp, majority)
    assert acc_mlp >= acc_base - 0.05, (acc_mlp, acc_base)
    preds = {r.pred_label for r in mlp.predictions.select("pred_label").distinct().collect()}
    assert preds <= {
        "stable_bull", "volatile_bull", "stable_bear", "volatile_bear", "consolidation"
    }


def test_seq_mlp_sequence_assembly_shape(spark, bars_df):
    """VERDICT r3 next #2: the seq model consumes the flattened windowed
    sequence. Pins the assembly contract to the reference's
    (lstm_forecasting.py:186-218): sequences are built over the FULL
    series and membership comes from the label row, so only the first
    seq_len−1 rows of each SERIES drop (all from the train slice —
    val/test windows reach back into earlier history but their labels
    stay in-split)."""
    from financial_big_data_spark.ml.forecasting import seq_mlp_classifier
    from financial_big_data_spark.operators.features import ordered_split

    seq_len = 5
    ds = regime_prediction_dataset(bars_df)
    ds = ordered_split(ds, series="symbol", time="ts")
    scored = seq_mlp_classifier(
        ds, series="symbol", time="ts", seq_len=seq_len,
        hidden_layers=(8,), max_iter=10,
    )
    slice_counts = {
        (r.symbol, r.split): r["count"]
        for r in ds.groupBy("symbol", "split").count().collect()
    }
    got_counts = {
        (r.symbol, r.split): r["count"]
        for r in scored.groupBy("symbol", "split").count().collect()
    }
    for (sym, split), n in slice_counts.items():
        lost = seq_len - 1 if split == "train" else 0  # train is first
        assert got_counts.get((sym, split), 0) == max(0, n - lost), (sym, split)
    assert "pred_label" in scored.columns


def test_seq_mlp_model_path(spark, bars_df):
    """End-to-end seq_mlp on the adversarial bars fixture.

    Unlike the point-in-time MLP (which reaches the persistence ceiling
    BECAUSE its input includes the current-regime one-hot), the sequence
    model sees only the windowed features — the reference's exact
    information set (lstm_forecasting.py:186-192, no regime input). On
    ~550 train windows of a fast-switching fixture that is a genuinely
    hard problem, so the bar here is: clearly above the 5-class random
    floor (0.2) and at/above the majority-class constant predictor within
    noise. The persistence-ceiling bar is exercised where the reference
    exercised it — on long sticky-regime series (BENCH ep3_seq_mlp_acc at
    sf0.1; at sf0.01 seq_mlp measures 1.0, tying persistence)."""
    seq = forecast_and_evaluate(bars_df, model="seq_mlp", seq_len=10)
    acc_seq = seq.accuracy.collect()[0].accuracy
    counts = {
        r.true_label: r["count"]
        for r in seq.predictions.groupBy("true_label").count().collect()
    }
    majority = max(counts.values()) / sum(counts.values())
    assert acc_seq > 0.3, acc_seq
    assert acc_seq >= majority - 0.05, (acc_seq, majority)
    preds = {r.pred_label for r in seq.predictions.select("pred_label").distinct().collect()}
    assert preds <= {
        "stable_bull", "volatile_bull", "stable_bear", "volatile_bear", "consolidation"
    }


def test_batch_score_mlp_production_roundtrip(spark, bars_df):
    """ADVICE r3: weights from the PRODUCTION training shape
    ([features + regime one-hot] → StandardScaler → MLP) must round-trip
    through batch_score_mlp when the scaler stats and regime label order
    are passed — pinning the one-hot ordering and the (x−mean)·(1/std)
    zero-variance-zeroed standardization against MLlib's own transform."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier
    from pyspark.ml.feature import (
        OneHotEncoder,
        StandardScaler,
        StringIndexer,
        VectorAssembler,
    )

    from financial_big_data_spark.ml.forecasting import batch_score_mlp
    from financial_big_data_spark.operators.features import FEATURE_COLS, ordered_split

    ds = regime_prediction_dataset(bars_df)
    ds = ordered_split(ds, series="symbol", time="ts")
    ds = ds.fillna(0.0, subset=FEATURE_COLS).cache()

    reg_idx = StringIndexer(inputCol="regime", outputCol="_ri").fit(ds)
    regime_labels = list(reg_idx.labelsArray[0])
    ohe = OneHotEncoder(inputCols=["_ri"], outputCols=["_ro"], dropLast=False)
    with_reg = ohe.fit(reg_idx.transform(ds)).transform(reg_idx.transform(ds))
    assembler = VectorAssembler(
        inputCols=[*FEATURE_COLS, "_ro"], outputCol="_fv", handleInvalid="keep"
    )
    idx_model = StringIndexer(
        inputCol="target_regime", outputCol="_label", handleInvalid="keep"
    ).fit(with_reg)
    prepared = idx_model.transform(assembler.transform(with_reg))
    scaler = StandardScaler(
        inputCol="_fv", outputCol="_fvs", withMean=True, withStd=True
    ).fit(prepared.where("split = 'train'"))
    prepared = scaler.transform(prepared)
    labels = list(idx_model.labelsArray[0])
    layers = [len(FEATURE_COLS) + len(regime_labels), 8, len(labels)]
    model = MultilayerPerceptronClassifier(
        featuresCol="_fvs", labelCol="_label", layers=layers, maxIter=15, seed=1
    ).fit(prepared.where("split = 'train'"))

    test = prepared.where("split = 'test'")
    expected = {
        (r.symbol, r.ts): labels[r._pred_idx]
        for r in model.transform(test)
        .select("symbol", "ts", F.col("prediction").cast("int").alias("_pred_idx"))
        .collect()
    }
    scored = batch_score_mlp(
        test, layers, model.weights.toArray(), labels,
        feature_cols=FEATURE_COLS, batch_size=64,
        regime_col="regime", regime_labels=regime_labels,
        scaler_mean=scaler.mean.toArray(), scaler_std=scaler.std.toArray(),
    ).select("symbol", "ts", "pred_label")
    rows = scored.collect()
    assert len(rows) == len(expected) > 0
    mismatches = [
        (r.symbol, r.ts, r.pred_label, expected[(r.symbol, r.ts)])
        for r in rows
        if r.pred_label != expected[(r.symbol, r.ts)]
    ]
    assert not mismatches, mismatches[:5]
    ds.unpersist()


def test_predict_batch_udf_mlp_seam(spark, bars_df):
    """batch_score_mlp's NumPy forward pass must reproduce MLlib's own
    MultilayerPerceptronClassificationModel.transform exactly — pins the
    flat-weight-vector layout (column-major affine blocks + bias, sigmoid
    hidden, softmax out) the predict_batch_udf seam assumes."""
    from pyspark.ml.classification import MultilayerPerceptronClassifier
    from pyspark.ml.feature import StringIndexer, VectorAssembler

    from financial_big_data_spark.ml.forecasting import batch_score_mlp
    from financial_big_data_spark.operators.features import FEATURE_COLS, ordered_split

    ds = regime_prediction_dataset(bars_df)
    ds = ordered_split(ds, series="symbol", time="ts")
    ds = ds.fillna(0.0, subset=FEATURE_COLS).cache()

    assembler = VectorAssembler(inputCols=FEATURE_COLS, outputCol="_fv")
    indexer = StringIndexer(inputCol="target_regime", outputCol="_label", handleInvalid="keep")
    idx_model = indexer.fit(ds)
    prepared = idx_model.transform(assembler.transform(ds))
    labels = list(idx_model.labelsArray[0])
    layers = [len(FEATURE_COLS), 8, len(labels)]
    mlp = MultilayerPerceptronClassifier(
        featuresCol="_fv", labelCol="_label", layers=layers, maxIter=15, seed=1
    )
    model = mlp.fit(prepared.where("split = 'train'"))

    test = prepared.where("split = 'test'")
    expected = {
        (r.symbol, r.ts): labels[r._pred_idx]
        for r in model.transform(test)
        .select("symbol", "ts", F.col("prediction").cast("int").alias("_pred_idx"))
        .collect()
    }
    scored = batch_score_mlp(
        test, layers, model.weights.toArray(), labels,
        feature_cols=FEATURE_COLS, batch_size=64,
    ).select("symbol", "ts", "pred_label")
    rows = scored.collect()
    assert len(rows) == len(expected) > 0
    mismatches = [
        (r.symbol, r.ts, r.pred_label, expected[(r.symbol, r.ts)])
        for r in rows
        if r.pred_label != expected[(r.symbol, r.ts)]
    ]
    assert not mismatches, mismatches[:5]
    ds.unpersist()


def test_lstm_model_path(spark, bars_df):
    """End-to-end numpy LSTM+attention (the reference's actual topology,
    ml/lstm_numpy.py) on the adversarial bars fixture — same information
    set and bars as seq_mlp: windowed features only, no current-regime
    input. Same bar: clearly above the 5-class random floor and at/above
    the majority-class constant predictor within noise."""
    res = forecast_and_evaluate(bars_df, model="lstm", seq_len=10)
    acc = res.accuracy.collect()[0].accuracy
    counts = {
        r.true_label: r["count"]
        for r in res.predictions.groupBy("true_label").count().collect()
    }
    majority = max(counts.values()) / sum(counts.values())
    assert acc > 0.3, acc
    assert acc >= majority - 0.05, (acc, majority)
    preds = {r.pred_label for r in res.predictions.select("pred_label").distinct().collect()}
    assert preds <= {
        "stable_bull", "volatile_bull", "stable_bear", "volatile_bear", "consolidation"
    }


def test_lstm_reference_shaped_config(spark, bars_df):
    """The reference's exact topology shape — stacked LSTM layers with
    inter-layer dropout and 4-head attention — runs end-to-end (capacity
    sized down for test time; the structure is the reference's)."""
    from financial_big_data_spark.ml.forecasting import lstm_regime_classifier
    from financial_big_data_spark.operators.features import ordered_split

    ds = regime_prediction_dataset(bars_df)
    ds = ordered_split(ds, series="symbol", time="ts")
    out = lstm_regime_classifier(
        ds, seq_len=10, hidden=16, n_layers=2, n_heads=4, dropout=0.2,
        epochs=2,
    )
    rows = out.where(F.col("split") == "test").select("pred_label").collect()
    assert rows and all(r.pred_label is not None for r in rows)


def test_distributed_grad_step_matches_driver(spark):
    """The treeReduce'd per-partition gradient sum must equal the driver
    full-batch gradient EXACTLY (loss is a mean: shard mean × shard size
    sums to the batch sum) — the correctness pin for data-parallel
    training."""
    import numpy as np

    from financial_big_data_spark.ml.forecasting import distributed_grad_step
    from financial_big_data_spark.ml.lstm_numpy import init_params, loss_and_grads

    rng = np.random.default_rng(0)
    B, T, Fdim, H, C, heads = 24, 5, 3, 8, 3, 2
    X = rng.normal(size=(B, T, Fdim))
    y = rng.integers(0, C, size=B)
    params = init_params(rng, Fdim, H, C, n_layers=2, n_heads=heads)
    rows = [
        (X[i].reshape(-1).tolist(), int(y[i]), str(i)) for i in range(B)
    ]
    df = spark.createDataFrame(
        rows, "_seq array<double>, _y int, _rid string"
    ).repartition(5)
    loss_d, grads_d, n = distributed_grad_step(df, params, heads, T, Fdim)
    loss, grads = loss_and_grads(params, X, y, n_heads=heads)
    assert n == B
    assert loss_d == pytest.approx(loss, rel=1e-12)
    for k in grads:
        assert np.allclose(grads_d[k], grads[k], rtol=1e-10, atol=1e-12), k


def test_lstm_distributed_training_end_to_end(spark, bars_df):
    """Data-parallel LSTM training: the train split never leaves the
    executors; the trained model still scores every test row."""
    from financial_big_data_spark.ml.forecasting import lstm_regime_classifier
    from financial_big_data_spark.operators.features import ordered_split

    ds = regime_prediction_dataset(bars_df)
    ds = ordered_split(ds, series="symbol", time="ts")
    out = lstm_regime_classifier(
        ds, seq_len=10, hidden=8, epochs=2, distributed=True,
    )
    rows = out.where(F.col("split") == "test").select("pred_label").collect()
    assert rows and all(r.pred_label is not None for r in rows)
