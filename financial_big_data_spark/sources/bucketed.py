"""Bucketed tables: shuffle-free co-located joins (100 TB join strategy).

At cluster scale the dominant cost of a fact-fact join is the shuffle of
both sides onto the join key. Bucketing pre-shuffles ONCE at write time:
``bucketBy(n, key)`` hash-partitions files on disk, and a join between two
tables bucketed on the same key with the same bucket count reads
co-located buckets directly — the plan contains NO Exchange on either
side (asserted in tests/test_bucketed.py). This is the standing
infrastructure for repeated event↔dimension-history joins that a
100 TB pipeline re-runs every batch; ``sortBy`` additionally pre-sorts
within buckets so the SortMergeJoin skips its sort.

Spark-first equivalent of a partitioned/clustered table layout; works
through the session catalog (``saveAsTable`` — bucket metadata lives in
the metastore, so ``spark.table`` resolves bucketing for planning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str | list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted) table."""
    keys = [bucket_key] if isinstance(bucket_key, str) else list(bucket_key)
    writer = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-key/same-count bucketed tables — exchange-free plan."""
    on = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
