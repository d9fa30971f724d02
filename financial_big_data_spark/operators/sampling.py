"""Sampling operators for training-data pipelines (north-star surface).

Two regimes a corpus pipeline needs:

- **stratified_systematic_sample**: DETERMINISTIC per-stratum sampling —
  rank rows inside each stratum by a stable ordering key and keep the
  first ``ceil(n·fraction)``. Re-runs produce byte-identical samples (no
  RNG), which is what dataset reproducibility requires; the rank is one
  window per stratum (single exchange on the stratum key).
- **stratified_random_sample**: seeded Bernoulli per stratum via Spark's
  native ``sampleBy`` — approximate counts, constant memory, no shuffle
  at all (map-side coin flips); the right tool when exact quotas don't
  matter at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_systematic_sample(
    df: DataFrame,
    strata: str,
    fractions: dict | float,
    order: str,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep the first ceil(n·f) rows of each stratum in a stable ordering.

    ``fractions``: one float for all strata, or {stratum_value: fraction}.
    Unlisted strata are dropped when a dict is given (sampleBy semantics).
    """
    order_cols = [order] + (order_tiebreak or [])
    w = Window.partitionBy(strata).orderBy(*[F.col(c).asc() for c in order_cols])
    wc = Window.partitionBy(strata)
    rn = F.row_number().over(w)
    n = F.count(F.lit(1)).over(wc)
    if isinstance(fractions, dict):
        frac = F.lit(None).cast("double")
        for k, v in fractions.items():
            frac = F.when(F.col(strata) == F.lit(k), F.lit(float(v))).otherwise(frac)
    else:
        frac = F.lit(float(fractions))
    quota = F.ceil(n * frac)
    return (
        df.withColumn("_rn", rn)
        .withColumn("_quota", quota)
        .where(F.col("_quota").isNotNull() & (F.col("_rn") <= F.col("_quota")))
        .drop("_rn", "_quota")
    )


def stratified_random_sample(
    df: DataFrame, strata: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Seeded Bernoulli stratified sample (Spark-native ``sampleBy``)."""
    return df.sampleBy(strata, fractions, seed=seed)
