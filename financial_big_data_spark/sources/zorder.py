"""Z-order (Morton-curve) clustered parquet writes — multi-column data
skipping for 100 TB layouts.

A single-column sort gives perfect file-level min/max pruning on that
column and none on any other. Interleaving the BITS of several columns'
rank-buckets (the Morton / Z-order curve) makes files compact in EVERY
participating dimension at once, so a selective filter on any of them
prunes most files from the footer statistics alone — the layout trick
behind Delta's OPTIMIZE ZORDER BY, re-expressed in plain DataFrame ops:

1. per column: quantile boundaries computed ONCE driver-side
   (``functions.stats._frozen_range_bounds`` — the same frozen-literal
   machinery the two-phase running sum uses, so bucket ids are stable
   under re-execution) → a ``bits``-bit rank bucket as a Column
   expression;
2. interleave the bucket bits into one Morton key (pure integer
   arithmetic, JVM-side);
3. bucket the key into equal-width slices of the key space (the
   per-column rank quantization makes the interleaved key ~uniform, so
   equal-width slices are balanced WITHOUT a second data pass —
   contiguous curve segments per file), route each bucket to a distinct
   shuffle partition through
   a driver-computed hash preimage (``repartition(n, col)`` is
   ``pmod(murmur3(col), n)`` — picking column values whose hash lands on
   each partition makes the bucket→partition map a deterministic
   bijection), then ``sortWithinPartitions`` + parquet write.

Step 3 deliberately avoids ``repartitionByRange``: its boundary SAMPLE is
seeded from the session's RDD-id counter, so the written layout would
differ run-to-run — a rewrite (compaction, versioned copy) of identical
data would reshuffle bytes for no reason, and layout-property tests
flake under load. With frozen boundaries + preimage routing the layout
is a pure function of the data.

Evidence contract: ``zorder_stats`` reads back the written files'
parquet FOOTERS (no data scan) and reports per-file min/max per column —
the tests assert a box predicate overlaps strictly fewer files than the
same data written unclustered.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.stats import _frozen_range_bounds


def _bucket_expr(col: str, bounds: list, bits: int) -> Column:
    """Frozen-boundary rank bucket in [0, 2^bits): count of boundaries
    strictly below the value — a pure function of the cell value."""
    b = F.lit(0)
    for bound in bounds:
        b = b + F.when(F.col(col) > F.lit(bound), 1).otherwise(0)
    return b


def morton_key(
    df: DataFrame, cols: Sequence[str], bits: int = 8
) -> Column:
    """The interleaved Z-order key for ``cols`` as a Column expression.
    ``bits`` per column; total key width = bits·len(cols) (≤ 62)."""
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 62:
        raise ValueError(f"bits={bits} × {len(cols)} cols exceeds a bigint")
    n_buckets = 1 << bits
    buckets = []
    for c in cols:
        bounds = _frozen_range_bounds(df, c, n_buckets)
        buckets.append(_bucket_expr(c, bounds, bits).cast("bigint"))
    key = F.lit(0).cast("bigint")
    n = len(cols)
    for bit in range(bits):
        for ci, bucket in enumerate(buckets):
            pos = bit * n + ci
            key = key + F.shiftleft(
                F.shiftright(bucket, bit).bitwiseAND(F.lit(1)), pos
            )
    return key


_PREIMAGE_CACHE: dict[int, list[int]] = {}


def _hash_preimages(spark, n_parts: int) -> list[int]:
    """The smallest bigints ``p_i`` with ``pmod(murmur3(p_i), n_parts) == i``
    for every partition ``i`` — computed by ONE bounded Spark job so the
    Python side never has to reimplement Spark's Murmur3. Repartitioning on
    a column holding ``p_{fid}`` then routes bucket ``fid`` to partition
    ``fid`` exactly, deterministically.

    Pure function of ``n_parts`` (murmur3 with Spark's fixed seed), so the
    result is memoized process-wide — repeated small writes (versioned
    view upserts, matview refreshes) must not pay the probe job again."""
    cached = _PREIMAGE_CACHE.get(n_parts)
    if cached is not None:
        return cached
    pre: dict[int, int] = {}
    lo = 0
    while len(pre) < n_parts:
        rows = (
            spark.range(lo, lo + 64 * n_parts)
            .select(
                F.col("id"),
                F.pmod(F.hash(F.col("id")), F.lit(n_parts)).alias("p"),
            )
            .collect()
        )
        for r in sorted(rows, key=lambda r: r["id"]):
            pre.setdefault(r["p"], r["id"])
        lo += 64 * n_parts
        if lo > 10_000 * n_parts:  # murmur3 covers residues fast; belt+braces
            raise RuntimeError(f"no hash preimage found for some of {n_parts} partitions")
    out = [pre[i] for i in range(n_parts)]
    _PREIMAGE_CACHE[n_parts] = out
    return out


def zorder_clustered(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    n_files: int = 8,
) -> DataFrame:
    """``df`` repartitioned into ≤ ``n_files`` contiguous Morton-curve
    segments, sorted within each — the deterministic clustering stage
    shared by ``write_zordered`` and the versioned-table z-order
    compaction. File boundaries are frozen quantiles of the Morton key;
    bucket→partition routing is a hash-preimage bijection; no sampled
    ``repartitionByRange`` anywhere, so the partition layout is a pure
    function of the data."""
    keyed = df.withColumn("_zkey", morton_key(df, cols, bits))
    # File boundaries: EQUAL-WIDTH splits of the key space. The per-column
    # buckets are already rank-quantized (frozen quantiles inside
    # morton_key), so the interleaved key is ~uniform over
    # [0, 2^(bits·n)) and equal-width splits are balanced by construction
    # — no quantile pass over the (large) interleave expression needed.
    # Strongly correlated columns concentrate mass on the curve diagonal
    # and can leave some slots lighter/empty (empty slots simply write no
    # file); layout stays deterministic either way.
    n_total = 1 << (bits * len(cols))
    bounds = sorted({(i * n_total) // n_files for i in range(1, n_files)})
    fid = _bucket_expr("_zkey", bounds, bits)
    n_slots = len(bounds) + 1
    pre = _hash_preimages(df.sparkSession, n_slots)
    slot = F.element_at(F.array(*[F.lit(int(p)) for p in pre]), fid + 1)
    return (
        keyed.withColumn("_slot", slot.cast("bigint"))
        .repartition(n_slots, "_slot")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", "_slot")
    )


def range_clustered(
    df: DataFrame, order_col: str, n_files: int | None = None,
    secondary: list[str] | None = None,
) -> DataFrame:
    """``df`` repartitioned into ≤ ``n_files`` contiguous ``order_col``
    ranges, sorted within each — the single-key analogue of
    ``zorder_clustered``, replacing ``repartitionByRange``'s sampled
    boundaries with frozen quantiles + preimage routing so versioned
    snapshot rewrites lay out identically run-to-run.

    ``secondary``: extra within-partition sort columns AFTER
    ``order_col`` — parquet row-group statistics then stay tight on
    them inside each ``order_col`` segment, so a reader filtering on a
    secondary column still skips row groups (the matview partials
    sidecar sorts (_file, group) this way: DML invalidation prunes
    files on _file, the group-scoped merge read prunes row groups on
    the group key). Deterministic like the primary sort."""
    from ..functions.stats import _NUMERIC_TYPES, _TEMPORAL_TYPES

    sec = list(secondary or [])
    spark = df.sparkSession
    n = n_files or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if n <= 1:
        # single-file target: no boundaries to freeze — one partition,
        # sorted, is already the deterministic layout (skips the
        # quantile-sketch job small versioned-view writes would pay)
        return df.repartition(1).sortWithinPartitions(order_col, *sec)
    base = dict(df.dtypes)[order_col].split("(")[0]
    if base in _NUMERIC_TYPES or base.startswith("decimal"):
        key = F.col(order_col).cast("double")
    elif base in _TEMPORAL_TYPES:
        key = F.col(order_col).cast("timestamp").cast("double")
    else:
        key = F.col(order_col)
    bounds = _frozen_range_bounds(df, order_col, n)
    fid = F.lit(0)
    for b in bounds:
        fid = fid + F.when(key > F.lit(b), 1).otherwise(0)
    n_slots = len(bounds) + 1
    pre = _hash_preimages(spark, n_slots)
    slot = F.element_at(F.array(*[F.lit(int(p)) for p in pre]), fid + 1)
    return (
        df.withColumn("_slot", slot.cast("bigint"))
        .repartition(n_slots, "_slot")
        .sortWithinPartitions(order_col, *sec)
        .drop("_slot")
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Cluster ``df`` on the Morton key of ``cols`` and write ``n_files``
    parquet files whose footer min/max are tight in every clustered
    dimension.

    The layout is DETERMINISTIC (see ``zorder_clustered``): two writes of
    the same frame produce the same per-file row sets and footer
    statistics (pinned by
    tests/test_zorder.py::test_zorder_write_is_deterministic)."""
    zorder_clustered(df, cols, bits, n_files).write.mode("overwrite").parquet(path)


def zorder_stats(path: str, cols: Sequence[str]) -> list[dict]:
    """Per-file footer min/max for ``cols`` — read from parquet METADATA
    only (pyarrow), no data scan. The pruning evidence for tests/docs."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        mins: dict = {c: None for c in cols}
        maxs: dict = {c: None for c in cols}
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for i in range(row_group.num_columns):
                col_meta = row_group.column(i)
                name = col_meta.path_in_schema
                if name in cols and col_meta.statistics is not None:
                    s = col_meta.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        out.append({"file": os.path.basename(f), "min": mins, "max": maxs})
    return out


def files_overlapping_box(
    stats: list[dict], box: dict[str, tuple]
) -> int:
    """How many files' footer ranges intersect the predicate box
    {col: (lo, hi)} — the number of files a stats-pruning scan must
    read."""
    n = 0
    for st in stats:
        hit = True
        for c, (lo, hi) in box.items():
            if st["min"][c] is None or st["max"][c] < lo or st["min"][c] > hi:
                hit = False
                break
        n += hit
    return n
