"""Model-evaluation metrics as DataFrame aggregations (SURVEY A13-A15, M8).

The reference computes accuracy / weighted & per-class F1 / confusion with
sklearn on collected arrays (reference src/models/lstm_forecasting.py:
288-302, lstm_analysis.py:144,193-196). Here every metric is a hash
aggregate over a (true, pred) DataFrame — distributed, no driver arrays:

    confusion  = groupBy(true, pred).count()
    accuracy   = avg(true == pred)
    F1 family  = precision/recall per class from the confusion counts

All are exact closed forms of counts, so the DuckDB oracle reproduces them
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_matrix(preds: DataFrame, true_col: str = "true_label", pred_col: str = "pred_label") -> DataFrame:
    """A13: (true, pred, n) counts."""
    return preds.groupBy(true_col, pred_col).agg(F.count(F.lit(1)).alias("n"))


def accuracy(preds: DataFrame, true_col: str = "true_label", pred_col: str = "pred_label") -> DataFrame:
    """A14: overall accuracy as a 1-row DataFrame."""
    return preds.agg(
        F.avg((F.col(true_col) == F.col(pred_col)).cast("double")).alias("accuracy"),
        F.count(F.lit(1)).alias("n"),
    )


def per_class_f1(
    preds: DataFrame, true_col: str = "true_label", pred_col: str = "pred_label"
) -> DataFrame:
    """A15: per-class precision/recall/F1 + support from confusion counts.

    TP = n(true=c, pred=c); FP = n(pred=c) - TP; FN = n(true=c) - TP.
    Classes appearing only in predictions get recall NULL (no support),
    matching the divide-by-zero guard semantics.
    """
    cm = confusion_matrix(preds, true_col, pred_col)
    by_true = cm.groupBy(true_col).agg(F.sum("n").alias("support"))
    by_pred = cm.groupBy(pred_col).agg(F.sum("n").alias("n_pred"))
    tp = cm.where(F.col(true_col) == F.col(pred_col)).select(
        F.col(true_col).alias("label"), F.col("n").alias("tp")
    )
    out = (
        by_true.select(F.col(true_col).alias("label"), "support")
        .join(by_pred.select(F.col(pred_col).alias("label"), "n_pred"), on="label", how="full")
        .join(tp, on="label", how="left")
        .na.fill({"tp": 0, "support": 0, "n_pred": 0})
    )
    precision = F.try_divide(F.col("tp"), F.col("n_pred"))
    recall = F.try_divide(F.col("tp"), F.col("support"))
    f1 = F.try_divide(2 * precision * recall, precision + recall)
    return out.select(
        "label",
        "support",
        precision.alias("precision"),
        recall.alias("recall"),
        F.coalesce(f1, F.lit(0.0)).alias("f1"),
    )


def weighted_f1(
    preds: DataFrame, true_col: str = "true_label", pred_col: str = "pred_label"
) -> DataFrame:
    """A15: support-weighted mean F1 (sklearn average='weighted')."""
    pc = per_class_f1(preds, true_col, pred_col).where(F.col("support") > 0)
    return pc.agg(
        (F.sum(F.col("f1") * F.col("support")) / F.sum("support")).alias("weighted_f1")
    )
