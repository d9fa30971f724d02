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


def global_running_sum(
    df, order_col: str, value_col: str, out: str = "running_sum", partitions: int | None = None
):
    """Cumulative sum in a global ordering WITHOUT a global-order window.

    ``sum() OVER (ORDER BY x)`` with no partition key funnels the whole
    frame through one task. The scalable form is two-phase: range-partition
    on the ordering key, compute per-partition local cumsums (parallel
    windows), then add each partition's prefix offset — the offsets are one
    row per partition (bounded metadata), computed driver-side and joined
    back broadcast.
    """
    from pyspark.sql import Window

    ranged = df.repartitionByRange(
        *( [partitions] if partitions else [] ), F.col(order_col)
    ).withColumn("_pid", F.spark_partition_id())
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("_local_cum", F.sum(value_col).over(w))
    totals = sorted(
        (r._pid, r._t)
        for r in local.groupBy("_pid").agg(F.sum(value_col).alias("_t")).collect()
    )
    offsets, acc = [], 0
    for pid, t in totals:
        offsets.append((pid, acc))
        acc += t or 0
    spark = df.sparkSession
    is_float = dict(df.dtypes)[value_col] in ("double", "float")
    schema = "_pid int, _offset double" if is_float else "_pid int, _offset bigint"
    offsets = [(p, float(o) if is_float else int(o)) for p, o in offsets]
    off_df = (
        spark.createDataFrame(offsets, schema)
        if offsets
        else spark.createDataFrame([], schema)
    )
    return (
        local.join(F.broadcast(off_df), on="_pid", how="left")
        .withColumn(out, F.col("_local_cum") + F.coalesce("_offset", F.lit(0)))
        .drop("_pid", "_local_cum", "_offset")
    )
