"""Mergeable sketches as DataFrame aggregates: KMV + HyperLogLog
(cardinality), bottom-k samples (quantiles), count-min (frequency).

The reference answers "how many distinct X" with exact pandas ``.unique()``
counts (reference market_analysis.py:262, :621 — `len(index.unique())` per
frame). At 100 TB an exact COUNT(DISTINCT high-cardinality-key) is one of
the most expensive relational operations there is: every distinct value
must survive a shuffle. The canonical scale answer is a *mergeable sketch*
— bounded per-group state whose partial states combine associatively, so
the whole computation is one map-side-combinable aggregate (and the saved
state can be merged across days/partitions/tables without re-reading the
data, exactly like Spark's own HLL++ `approx_count_distinct` state).

Two textbook sketches, built from scratch on cross-engine-reproducible
hashes so the DuckDB oracle can re-derive them bit-for-bit:

- **KMV (k minimum values)** [Bar-Yossef et al., RANDOM 2002]: keep the k
  smallest distinct hash values; with U_(k) = the k-th smallest as a
  fraction of the hash space, E[distinct] ≈ (k-1)/U_(k).  The sketch IS
  the k values, so merging = union → keep k smallest.
- **HyperLogLog** [Flajolet et al., AofA 2007]: bucket by the first b hash
  bits, keep max leading-zero rank per bucket; harmonic-mean estimate with
  the standard small-range linear-counting correction. Registers merge by
  element-wise max — the groupBy(max) that builds them is already the
  merge operator.

Hashing: default is the repo's standard 60-bit uniform int — first 15 hex
chars of md5 — which both Spark (``conv(substr(md5,1,15),16,10)``) and
DuckDB (``('0x' || substr(md5,1,15))::BIGINT``) compute identically (see
operators/dedup.py). ``hash="xxhash64"`` swaps in the JVM-native
non-cryptographic hash for production throughput (no DuckDB mirror —
estimator math and merge laws are hash-agnostic and pinned both ways).

Everything here is pure Column expressions — no UDFs, no collects; the
only shuffles are one distinct on (group, hash) for KMV and one partial
aggregate for HLL registers.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 60
HASH_SPACE = float(2**HASH_BITS)


def uniform_hash60(col: F.Column, salt: str = "", hash: str = "md5") -> F.Column:
    """60-bit uniform integer hash of a value's string form.

    ``md5`` (default) is the CROSS-ENGINE hash — DuckDB computes the same
    hex, so oracles re-derive sketches bit-for-bit. ``xxhash64`` is the
    PRODUCTION hash — JVM-native, ~an order of magnitude cheaper per row
    than md5's cryptographic rounds — masked to the same 60-bit space so
    every estimator/merge law is hash-agnostic (pinned in tests). Sketches
    built with different hashes must never be merged; keep one hash per
    sketch lineage.
    """
    s = F.col(col) if isinstance(col, str) else col
    if hash == "xxhash64":
        return F.xxhash64(s.cast("string"), F.lit(salt)).bitwiseAND(
            F.lit(2**HASH_BITS - 1)
        )
    if hash != "md5":
        raise ValueError(f"unknown hash {hash!r} (md5 | xxhash64)")
    h = F.md5(F.concat(s.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


# --------------------------------------------------------------------------
# KMV
# --------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    value: str,
    k: int = 256,
    by: list[str] | None = None,
    hash: str = "md5",
) -> DataFrame:
    """Per-group k-minimum-values sketch: ≤ k rows (*by, h) per group.

    One shuffle for the distinct on (group, hash) — duplicate values AND
    hash collisions collapse there, so the subsequent keyed rank sees
    unique hashes only (no row_number ties possible). The rank window is
    keyed (never partitionless) and Spark's sort spills, so a group with
    billions of distinct values still only RETAINS k rows.
    """
    if k < 2:
        raise ValueError("kmv requires k >= 2")
    by = list(by or [])
    hashed = df.select(*by, uniform_hash60(value, hash=hash).alias("h")).distinct()
    return _k_smallest(hashed, k, by)


def keyed_topk(
    df: DataFrame, order_cols: list, k: int, by: list[str]
) -> DataFrame:
    """THE keyed smallest-k-by-order pattern: grouped → keyed rank
    window (spill-safe, never partitionless); global → orderBy+limit,
    which Spark plans as TakeOrderedAndProject (per-partition top-k,
    k-row merge). Shared by the KMV sketch, the bottom-k sampler and
    the weighted sampler — one place to fix spill/tiebreak behavior."""
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    if not by:
        return df.orderBy(*order).limit(k)
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def _k_smallest(hashed: DataFrame, k: int, by: list[str]) -> DataFrame:
    """k smallest distinct hashes per group (keyed_topk on the hash)."""
    return keyed_topk(hashed, ["h"], k, by)


def kmv_merge(a: DataFrame, b: DataFrame, k: int, by: list[str] | None = None) -> DataFrame:
    """Union two KMV sketches and keep the k smallest per group — the
    associative/commutative merge that makes KMV a one-pass aggregate."""
    by = list(by or [])
    return _k_smallest(a.unionByName(b).distinct(), k, by)


def kmv_set_estimates(
    a: DataFrame, b: DataFrame, k: int, by: list[str] | None = None
) -> DataFrame:
    """SET-OPERATION estimates from two COORDINATED KMV sketches (same
    hash family — the property that makes bottom-k sketches composable,
    Beyer et al. SIGMOD'07): the k smallest hashes of A∪B are a uniform
    sample of the union, so the fraction of that sample present in BOTH
    sketches estimates Jaccard(A, B), and intersection cardinality
    follows as Ĵ · |A∪B|̂ — the audience-overlap / corpus-overlap
    estimator, computed entirely from two ≤k-row sketches (never from
    the underlying data). Returns per group: est_union, est_jaccard,
    est_intersection.

    Accuracy: Ĵ has standard error ≈ sqrt(J(1−J)/k); groups whose union
    sketch is under capacity are EXACT (the sample is the whole union).
    Sketches built with different hashes must never be combined — same
    contract as ``kmv_merge``."""
    by = list(by or [])
    u = kmv_merge(a, b, k, by=by)
    in_a = a.select(*by, "h").withColumn("_ina", F.lit(1))
    in_b = b.select(*by, "h").withColumn("_inb", F.lit(1))
    tagged = (
        u.join(in_a, on=[*by, "h"], how="left")
        .join(in_b, on=[*by, "h"], how="left")
    )
    agg = tagged.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("kth"),
        F.sum(
            F.when((F.col("_ina") == 1) & (F.col("_inb") == 1), 1).otherwise(0)
        ).alias("n_both"),
    )
    est_union = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth").cast("double")
    )
    jac = F.col("n_both").cast("double") / F.col("n_kept")
    return agg.select(
        *by,
        est_union.alias("est_union"),
        jac.alias("est_jaccard"),
        (est_union * jac).alias("est_intersection"),
    )


def kmv_estimate(sketch: DataFrame, k: int, by: list[str] | None = None) -> DataFrame:
    """Distinct-count estimate from a KMV sketch.

    A group that never filled its k slots has every distinct hash in the
    sketch — the count is exact. A full sketch estimates
    (k-1) / (kth_min / 2^60).
    """
    by = list(by or [])
    agg = sketch.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n_kept"), F.max("h").alias("kth")
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("kth").cast("double"))
    return agg.select(*by, F.col("n_kept"), est.alias("est_distinct"))


# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_sketch(
    df: DataFrame,
    value: str,
    b: int = 8,
    by: list[str] | None = None,
    hash: str = "md5",
) -> DataFrame:
    """HLL registers: (*by, bucket, rho) with rho = max leading-zero rank.

    bucket = top b hash bits; the remaining w = 60-b bits yield
    rho = (w-bit width) - floor(log2(rest)) computed EXACTLY via the
    length of the binary string (`bin`, integer-exact in both engines —
    no float log2 edge cases at powers of two). rest == 0 → rho = w+1.

    One partial-aggregatable shuffle on (*by, bucket): the groupBy(max)
    IS the HLL merge, so map-side combine leaves ≤ 2^b rows per group
    per partition in flight — bounded state regardless of input size.
    """
    if not 4 <= b <= 16:
        raise ValueError("hll bucket bits b must be in [4, 16]")
    by = list(by or [])
    wbits = HASH_BITS - b
    h = uniform_hash60(value, hash=hash)
    # Integer bit ops only: h is up to 2^60 and would lose low bits through
    # a double division (2^60 > 2^53) — floor(h/2^w) could then land in the
    # wrong bucket at boundaries. shiftright/bitwiseAND are exact.
    bucket = F.shiftright(h, wbits).cast("int")
    rest = h.bitwiseAND(F.lit(2**wbits - 1))
    rho = F.when(rest == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.conv(rest.cast("string"), 10, 2))
    )
    return (
        df.select(*by, bucket.alias("bucket"), rho.cast("int").alias("rho"))
        .groupBy(*by, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Element-wise max of two register sets — the HLL merge."""
    by = list(by or [])
    return a.unionByName(b).groupBy(*by, "bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, b: int, by: list[str] | None = None) -> DataFrame:
    """Cardinality estimate from HLL registers (standard HLL corrections).

    raw = alpha_m * m^2 / (sum 2^-rho + zeros), zeros = m - present
    buckets (each empty register contributes 2^-0 = 1). When raw ≤ 2.5m
    and zero registers remain, linear counting m*ln(m/zeros) is the
    better estimator (Flajolet et al. §4). 60-bit hashes need no
    large-range correction at any realistic cardinality.

    The harmonic sum is accumulated as an EXACT integer: each register
    contributes 2^(maxrho - rho) (a bigint ≤ 2^(60-b); the group total is
    ≤ 2^60, no overflow) and the single division by 2^maxrho happens once
    at the end — so the float result is independent of Spark's aggregation
    order and bit-identical to the serial oracle.
    """
    m = 2**b
    maxrho = HASH_BITS - b + 1
    by = list(by or [])
    inv_term = F.pow(F.lit(2.0), F.lit(maxrho) - F.col("rho")).cast("long")
    agg = registers.groupBy(*by).agg(
        F.sum(inv_term).alias("inv"),
        F.count(F.lit(1)).alias("n_present"),
    )
    zeros = (F.lit(m) - F.col("n_present")).cast("double")
    s_present = F.col("inv").cast("double") / F.lit(float(2**maxrho))
    raw = F.lit(_alpha(m) * m * m) / (s_present + zeros)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(*by, est.alias("est_distinct"), zeros.cast("long").alias("empty_registers"))


# --------------------------------------------------------------------------
# Bottom-k uniform row sample → approximate quantiles
# --------------------------------------------------------------------------


def bottomk_rows(
    df: DataFrame,
    k: int,
    id_cols: list[str],
    keep: list[str] | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Deterministic uniform row sample: the k rows whose 60-bit md5 hash
    of the id tuple ranks smallest per group (ties impossible for unique
    ids; broken on the ids themselves regardless).

    Unlike ``df.sample()`` this is layout-invariant (a pure function of
    the row ids — the same property the DBSCAN eps sampler and the epoch
    shuffle rely on) and MERGEABLE: the bottom-k of a union is the
    k-smallest of the parts' bottom-k sets, so per-partition/per-day
    samples combine without rescanning — a coordinated bottom-k sketch
    (Cohen & Kaplan, PODS 2007).
    """
    if k < 1:
        raise ValueError("bottomk requires k >= 1")
    by = list(by or [])
    keep = list(keep or [])
    idstr = F.concat_ws("|", *[F.col(c).cast("string") for c in id_cols])
    sel = df.select(*by, *keep, *id_cols, uniform_hash60(idstr).alias("_h"))
    order = [F.col("_h")] + [F.col(c) for c in id_cols]
    if not by:
        return sel.orderBy(*order).limit(k).drop("_h")
    w = Window.partitionBy(*[F.col(c) for c in by]).orderBy(*order)
    return (
        sel.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_h")
    )


def quantile_sketch(
    df: DataFrame,
    value: str,
    id_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.9),
    k: int = 256,
    by: list[str] | None = None,
) -> DataFrame:
    """Approximate per-group quantiles from a bottom-k uniform sample:
    exact interpolated percentiles OVER THE SAMPLE. Rank error is
    O(1/sqrt(k)) by DKW; a group with ≤ k rows is sampled whole, so its
    quantiles are exact. The full-data alternative shuffles every row
    into a per-group sort; this retains k rows per group and one exact
    percentile over bounded input.
    """
    by = list(by or [])
    samp = bottomk_rows(df, k, id_cols, keep=[value], by=by)
    aggs = [F.count(F.lit(1)).alias("n_sampled")] + [
        F.expr(f"percentile({value}, {q})").alias(f"p{int(round(q * 100))}")
        for q in qs
    ]
    return samp.groupBy(*by).agg(*aggs)


# --------------------------------------------------------------------------
# Count-min sketch (frequency estimation / heavy hitters)
# --------------------------------------------------------------------------


def cms_sketch(
    df: DataFrame,
    value: str,
    depth: int = 4,
    width: int = 256,
    by: list[str] | None = None,
    hash: str = "md5",
) -> DataFrame:
    """Count-min sketch [Cormode & Muthukrishnan, J.Alg 2005]: a
    depth × width counter grid per group — (*by, row, slot, cnt).

    Each input row increments one slot per hash row (slot_j = h_j(x) mod
    width, independent rows via salted hashes). Built as ONE
    partial-aggregatable shuffle over (*by, row, slot): bounded state
    d·w per group regardless of distinct-value count, and two sketches
    MERGE by element-wise counter addition — the groupBy(sum) is its own
    merge operator, same contract as the HLL registers.
    """
    if depth < 1 or width < 2:
        raise ValueError("cms requires depth >= 1 and width >= 2")
    by = list(by or [])
    rows = df.select(
        *by,
        F.posexplode(
            F.array(
                *[
                    (uniform_hash60(value, salt=f"#cms{j}", hash=hash) % width)
                    .cast("int")
                    for j in range(depth)
                ]
            )
        ).alias("row", "slot"),
    )
    return rows.groupBy(*by, "row", "slot").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_merge(a: DataFrame, b: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Element-wise counter addition — the CMS merge."""
    by = list(by or [])
    return (
        a.unionByName(b)
        .groupBy(*by, "row", "slot")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    value: str,
    depth: int = 4,
    width: int = 256,
    by: list[str] | None = None,
    hash: str = "md5",
) -> DataFrame:
    """Estimated count per probe value: min over the depth rows of the
    probed slots (never under-counts; over-counts by collision mass with
    probability ≤ (1/2)^depth beyond 2N/width). The probe side explodes
    to depth rows, joins the sketch on the bounded (row, slot) key, and
    takes one min aggregate — probe sets are usually candidate lists
    (bounded), so the join is broadcast-shaped at scale."""
    by = list(by or [])
    p = probes.select(
        *by,
        F.col(value).alias("_probe"),
        F.posexplode(
            F.array(
                *[
                    (uniform_hash60(value, salt=f"#cms{j}", hash=hash) % width)
                    .cast("int")
                    for j in range(depth)
                ]
            )
        ).alias("row", "slot"),
    )
    joined = p.join(sketch, on=[*by, "row", "slot"], how="left").select(
        *by, "_probe", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return (
        joined.groupBy(*by, "_probe")
        .agg(F.min("cnt").alias("est_count"))
        .withColumnRenamed("_probe", value)
    )
