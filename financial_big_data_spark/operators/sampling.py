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


def seeded_shuffle(
    df: DataFrame, seed: int, id_col: str = "doc_id", pos_col: str = "shuffle_pos"
) -> DataFrame:
    """Deterministic epoch shuffle: a total order that is uniform-random
    with respect to any data attribute, reproducible from ``seed`` alone —
    how a training pipeline re-shuffles a corpus per epoch without RNG
    state or a materialized permutation table. Same seed → byte-identical
    order on any cluster layout; different seeds → independent orders.

    The shuffle key is ``md5(seed ':' id)`` (engine-portable, unlike
    xxhash64 which DuckDB lacks); the 1-based position is a global running
    count over that key via the two-phase ``global_running_sum`` — NO
    partitionless ORDER BY window, so assigning positions to a corpus
    stays distributed. ``id_col`` must be unique (md5 collisions are
    broken by the id tiebreak, so the order is total regardless).
    """
    from ..functions.stats import global_running_sum

    key = F.md5(
        F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string"))
    )
    with_key = df.withColumn("_shuffle_key", key).withColumn("_one", F.lit(1))
    out = global_running_sum(
        with_key, "_shuffle_key", "_one", out=pos_col, tiebreak=[id_col]
    )
    return out.drop("_one", "_shuffle_key")


def interleave_sources(
    df: DataFrame,
    weights: dict[str, float],
    seed: int = 0,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted deterministic interleave of sources — the data-mixing
    order for training: a source with weight w contributes ~w of every
    prefix of the stream (proportional-progress scheduling), so the mix
    ratio holds at every checkpoint, not just over the full epoch.

    Within each source, rows take a seeded-shuffle rank r (per-source
    window over the md5 key — keyed, scalable); the global order is then
    ascending ``virtual time`` r/w — the classic weighted-fair-queueing
    discretization. Sources absent from ``weights`` are dropped (weight
    0). Returns the input plus (src_rank, interleave_pos). The global
    position again comes from the two-phase running count, not a
    partitionless window.
    """
    from ..functions.stats import global_running_sum

    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"weights must be positive: {weights}")
    kept = df.where(F.col(source_col).isin(*weights.keys()))
    key = F.md5(
        F.concat(F.lit(str(seed)), F.lit(":"), F.col(id_col).cast("string"))
    )
    w_src = Window.partitionBy(source_col).orderBy(key, F.col(id_col))
    ranked = kept.withColumn("src_rank", F.row_number().over(w_src))
    weight_map = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    ranked = ranked.withColumn(
        "_vtime", F.col("src_rank") / weight_map[F.col(source_col)]
    ).withColumn("_one", F.lit(1))
    out = global_running_sum(
        ranked, "_vtime", "_one", out="interleave_pos",
        tiebreak=[source_col, id_col],
    )
    return out.drop("_one", "_vtime")
