"""Pandas/sklearn-parity statistics expressions (SURVEY.md §2.4 A5, §2.8 C11).

Spark's built-in ``skewness``/``kurtosis`` are the *population* moments
(g1, g2); the reference uses pandas ``Series.skew()``/``.kurtosis()``
(reference market_analysis.py:254-255), which are the *bias-corrected sample*
statistics (G1, G2 — the Fisher-Pearson adjusted forms). The correction is a
closed-form function of n, so we derive the corrected statistic from Spark's
population aggregate plus a count — still a single hash-aggregate pass, fully
JVM-side, no UDF:

    G1 = g1 * sqrt(n*(n-1)) / (n-2)
    G2 = ((n+1)*g2 + 6) * (n-1) / ((n-2)*(n-3))

Both match DuckDB's ``skewness``/``kurtosis`` (verified to ~1e-13), which is
what the correctness oracle runs.

Z-score parity: sklearn ``StandardScaler`` divides by the *population* std
(ddof=0, reference src/clustering/methods/clustering.py:21-22) — use
``stddev_pop``, not Spark's sample-std default.
"""

from __future__ import annotations

from pyspark.sql import Column, WindowSpec
from pyspark.sql import functions as F


def skew_pandas(c: Column | str) -> Column:
    """Bias-corrected sample skewness G1 (pandas ``Series.skew()``).

    Null when n < 3 or variance is 0, matching pandas.
    """
    c = F.col(c) if isinstance(c, str) else c
    n = F.count(c).cast("double")
    g1 = F.skewness(c)
    return F.when(n >= 3, g1 * F.sqrt(n * (n - 1)) / (n - 2))


def kurtosis_pandas(c: Column | str) -> Column:
    """Bias-corrected excess kurtosis G2 (pandas ``Series.kurtosis()``).

    Null when n < 4, matching pandas.
    """
    c = F.col(c) if isinstance(c, str) else c
    n = F.count(c).cast("double")
    g2 = F.kurtosis(c)
    return F.when(n >= 4, ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3)))


def zscore(c: Column | str, w: WindowSpec) -> Column:
    """sklearn-``StandardScaler`` z-score over a window scope (ddof=0)."""
    c = F.col(c) if isinstance(c, str) else c
    return F.try_divide(c - F.avg(c).over(w), F.stddev_pop(c).over(w))


def with_global_stats(df, aggs: list[Column]):
    """Attach global aggregates to every row WITHOUT a global window.

    ``expr OVER ()`` (``Window.partitionBy()`` with no keys) moves the whole
    frame to ONE partition — a scale-killer on fact tables and a
    ``WindowExec: No Partition Defined`` warning everywhere else. The
    broadcast-crossJoin of a 1-row aggregate is the distributed equivalent:
    the aggregate is a map-side-combined single row, and the join is a
    broadcast nested loop that preserves the input partitioning.
    """
    return df.crossJoin(F.broadcast(df.agg(*aggs)))
