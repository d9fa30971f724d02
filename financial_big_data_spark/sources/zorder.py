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
3. ``repartitionByRange`` on the key (range exchange → contiguous curve
   segments per file) + ``sortWithinPartitions`` + parquet write.

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


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Cluster ``df`` on the Morton key of ``cols`` and write ``n_files``
    parquet files whose footer min/max are tight in every clustered
    dimension."""
    keyed = df.withColumn("_zkey", morton_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


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
