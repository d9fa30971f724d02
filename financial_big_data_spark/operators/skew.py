"""Skew-mitigation helpers: salted aggregation and salted joins (SURVEY §4.2).

AQE's skew-join splitting handles most runtime skew; these explicit
operators cover the cases AQE can't re-plan — a hot grouping key in a hash
aggregate, or a broadcast-ineligible join with a pathological key. Both are
pure DataFrame rewrites:

- **salted_count/salted_agg**: key → (key, salt) partial aggregate →
  final merge by key. Two small shuffles instead of one hot partition; the
  partial output is ≤ |keys|×salt rows regardless of input size.
- **salted_join**: replicate the small side salt-ways, salt the large side
  rows randomly-but-deterministically (hash of a unique column), join on
  (key, salt). Spreads one hot key across ``salt`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, buckets: int) -> Column:
    # deterministic pseudo-random salt from a row-identifying column
    return F.pmod(F.xxhash64(col), F.lit(buckets))


def salted_count(
    df: DataFrame, key: str, salt_from: str, buckets: int = 16
) -> DataFrame:
    """groupBy(key).count() resilient to one dominant key."""
    partial = (
        df.withColumn("_salt", _salt(F.col(salt_from), buckets))
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return partial.groupBy(key).agg(F.sum("_n").alias("n"))


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt_from: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe per-key count/sum/mean/min/max via two-level aggregation."""
    partial = (
        df.withColumn("_salt", _salt(F.col(salt_from), buckets))
        .groupBy(key, "_salt")
        .agg(
            F.count(value).alias("_n"),
            F.sum(value).alias("_sum"),
            F.min(value).alias("_min"),
            F.max(value).alias("_max"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_n").alias("n"),
        F.sum("_sum").alias("sum"),
        (F.sum("_sum") / F.sum("_n")).alias("mean"),
        F.min("_min").alias("min"),
        F.max("_max").alias("max"),
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    buckets: int = 16,
) -> DataFrame:
    """Equi-join where ``large`` has skewed keys and ``small`` is modest but
    above broadcast size: small side replicates ``buckets``-ways, large side
    salts deterministically, join runs on (key, salt)."""
    salted_large = large.withColumn("_salt", _salt(F.col(salt_from), buckets))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_large.join(replicated_small, on=[key, "_salt"]).drop("_salt")
