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


def weighted_sample(
    df: DataFrame,
    k: int,
    weight: str,
    id_cols: list[str],
    by: list[str] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement — the
    Efraimidis–Spirakis (2006) exponential-jump formulation: each row
    draws key ``-ln(u)/w`` with ``u`` uniform from the 60-bit md5 hash
    of (seed, id), and the k SMALLEST keys win; inclusion probability is
    proportional to ``weight`` among competitors. The
    quality-score-weighted cousin of ``sketches.bottomk_rows``:

    - **deterministic / layout-invariant**: u is a pure function of the
      row id and seed, never RNG state — re-runs and repartitions pick
      the same sample (the property every oracle here leans on);
    - **mergeable**: the weighted-bottom-k of a union is the k smallest
      of the parts' keys, so per-partition/per-day samples combine
      without rescanning — a one-permutation coordinated sample;
    - **keyed**: per-``by``-group top-k via a keyed rank window (global
      case is one TakeOrderedAndProject) — no partitionless window.

    Rows with null/non-positive weight are excluded (they can never win
    under the formulation). Returns the selected rows plus ``_wkey``.
    Corpus use: ``weight=quality_score`` draws a training subset biased
    toward quality while keeping tail diversity — the soft alternative
    to a hard threshold gate.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from .sketches import HASH_BITS, keyed_topk, uniform_hash60

    by = list(by or [])
    idstr = F.concat_ws(
        "|", F.lit(str(seed)), *[F.col(c).cast("string") for c in id_cols]
    )
    # u in (0, 1]: (h + 1) / 2^60, with h + 1 added in EXACT bigint
    # BEFORE the double cast — double(h) + 1.0 rounds differently for
    # ~3% of 60-bit hashes (beyond the 53-bit mantissa), which would
    # break the bit-for-bit oracle parity this sampler advertises
    u = (uniform_hash60(idstr) + F.lit(1)).cast("double") / F.lit(
        float(2**HASH_BITS)
    )
    w = F.col(weight).cast("double")
    keyed = df.where(w.isNotNull() & (w > 0)).withColumn(
        "_wkey", -F.log(u) / w
    )
    return keyed_topk(keyed, ["_wkey", *id_cols], k, by)


def temperature_mix_weights(
    df: DataFrame,
    alpha: float,
    source_col: str = "source",
    size_col: str | None = None,
    normalize: bool = True,
) -> dict[str, float]:
    """Temperature-scaled mixing weights (the T5 / multilingual-LM
    recipe): source s of size n_s gets weight ∝ n_s^alpha, where n_s is
    the document count or — closer to the published recipe —
    ``sum(size_col)`` (tokens/chars) when given. ``alpha=1`` reproduces
    natural proportions, ``alpha=0`` uniform across sources,
    ``0<alpha<1`` up-samples the tail — the standard knob against
    head-domain domination. One aggregate over the source column
    (bounded rows collect); feed the result to ``interleave_sources``
    for the prefix-stable training order.

    ``normalize=False`` returns the raw n^alpha weights —
    ``interleave_sources`` is scale-invariant (virtual time r/w orders
    identically under any positive scaling), and skipping the
    normalizing sum keeps the weights bit-reproducible across engines
    (alpha=0.5 is one IEEE-exact sqrt; the normalized form adds a
    sum whose accumulation order floats with the engine)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    size = F.count(F.lit(1)) if size_col is None else F.sum(size_col)
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(size).collect()
        # a NULL source key would also crash the sorted() below —
        # filtered with the null/non-positive sizes
        if r[0] is not None and r[1] is not None and r[1] > 0
    }
    if not counts:
        return {}
    scaled = {s: float(n) ** alpha for s, n in sorted(counts.items())}
    if not normalize:
        return scaled
    total = sum(scaled.values())
    return {s: v / total for s, v in scaled.items()}


def stratified_split(
    df: DataFrame,
    strata: str,
    id_col: str,
    cuts: tuple = (0.8, 0.9),
    labels: tuple = ("train", "val", "test"),
    salt: str = "v1",
    out: str = "split",
) -> DataFrame:
    """Deterministic EXACT-proportion stratified train/val/test split.

    Every stratum is split at exactly ``floor(cut_i · n_stratum)`` rows —
    the property Bernoulli splitting can't give (a 0.1 validation slice of
    a 100-row stratum is exactly 10 docs, not 10 ± noise) — with the
    "random" order supplied by ``md5(salt # id)``, so re-runs and
    re-splits under a new salt are byte-reproducible with no RNG state.

    ``cuts`` are cumulative upper fractions (last label takes the rest).
    They are compared as the SAME double literals on every engine — the
    caller passes cumulative values directly so no float summation of
    weights can move a floor boundary by one ulp.

    Scale shape: a naive per-stratum rank is one window task per stratum
    (20 sources at 100 TB = 20 tasks). Instead the md5 key's first two hex
    chars bucket each stratum into 256 slices whose (bucket, hash) order
    IS the hash order — per-(stratum, bucket) local row_numbers run at
    strata × 256 parallelism, and each slice's global offset + the stratum
    total join back from one bounded collect (strata × 256 count rows,
    the frozen-prefix-offset discipline of ``global_running_sum``).
    """
    if len(labels) != len(cuts) + 1:
        raise ValueError("stratified_split: need len(labels) == len(cuts) + 1")
    if list(cuts) != sorted(cuts) or not all(0.0 < c < 1.0 for c in cuts):
        raise ValueError("stratified_split: cuts must be ascending in (0, 1)")
    h = F.md5(F.concat_ws("#", F.lit(salt), F.col(id_col).cast("string")))
    tagged = df.withColumn("_h", h).withColumn(
        "_b", F.conv(F.substring(F.col("_h"), 1, 2), 16, 10).cast("int")
    )
    counts = tagged.groupBy(strata, "_b").agg(F.count(F.lit(1)).alias("c")).collect()
    if any(r[0] is None for r in counts):
        # the meta join below is null-unsafe equality — a NULL stratum
        # would silently vanish from the output; refuse loudly instead
        # (mirroring chi2_independence's null-category guard)
        raise ValueError(
            f"stratified_split: NULL values in strata column {strata!r} — "
            "fill or filter them before splitting"
        )
    per: dict = {}
    for r in counts:
        per.setdefault(r[0], {})[r[1]] = r[2]
    meta_rows = []
    for s, bm in per.items():
        off, n_s = 0, sum(bm.values())
        for b in sorted(bm):
            meta_rows.append((s, b, off, n_s))
            off += bm[b]
    stype = dict(df.dtypes)[strata]
    meta = df.sparkSession.createDataFrame(
        meta_rows, f"{strata} {stype}, _b int, _off bigint, _n bigint"
    )
    w = Window.partitionBy(strata, "_b").orderBy(F.col("_h"), F.col(id_col))
    ranked = tagged.join(F.broadcast(meta), on=[strata, "_b"]).withColumn(
        "_rank", F.row_number().over(w) + F.col("_off")
    )
    label = F.lit(labels[-1])
    for c, lab in zip(reversed(cuts), reversed(labels[:-1])):
        label = F.when(
            F.col("_rank") <= F.floor(F.col("_n") * F.lit(float(c))), F.lit(lab)
        ).otherwise(label)
    return ranked.withColumn(out, label).drop("_h", "_b", "_off", "_n", "_rank")
