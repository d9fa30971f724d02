"""Pins for sources/maintenance.py: partition-scoped MERGE semantics
(update/insert/survive + untouched partitions' files stay byte-identical)
and small-file compaction."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.sources.maintenance import (
    compact_small_files,
    merge_upsert,
)


@pytest.fixture()
def table_dir(spark):
    d = tempfile.mkdtemp(prefix="merge_tbl_")
    shutil.rmtree(d)  # Spark wants to create it
    base = spark.createDataFrame(
        [
            (1, "2024-01-01", 10.0),
            (2, "2024-01-01", 20.0),
            (3, "2024-01-02", 30.0),
            (4, "2024-01-03", 40.0),
        ],
        "k long, day string, v double",
    )
    base.write.partitionBy("day").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(spark, d):
    # partition values read back type-inferred (DATE here) — normalize
    return {
        r["k"]: (str(r["day"]), r["v"])
        for r in spark.read.parquet(d).collect()
    }


def test_merge_upsert_update_insert_survive(spark, table_dir):
    untouched = sorted(glob.glob(os.path.join(table_dir, "day=2024-01-03", "*.parquet")))
    mtimes = [os.path.getmtime(f) for f in untouched]
    updates = spark.createDataFrame(
        [
            (2, "2024-01-01", 99.0),   # update existing key
            (5, "2024-01-02", 50.0),   # new key in existing partition
            (6, "2024-01-05", 60.0),   # new partition entirely
        ],
        "k long, day string, v double",
    )
    merge_upsert(spark, table_dir, updates, key="k", partition_col="day")
    rows = _rows(spark, table_dir)
    assert rows[2] == ("2024-01-01", 99.0)      # updated
    assert rows[1] == ("2024-01-01", 10.0)      # survivor in touched partition
    assert rows[3] == ("2024-01-02", 30.0)      # survivor
    assert rows[5] == ("2024-01-02", 50.0)      # inserted
    assert rows[6] == ("2024-01-05", 60.0)      # new partition
    assert rows[4] == ("2024-01-03", 40.0)      # untouched partition intact
    # and its FILES were not rewritten
    after = sorted(glob.glob(os.path.join(table_dir, "day=2024-01-03", "*.parquet")))
    assert after == untouched
    assert [os.path.getmtime(f) for f in after] == mtimes


def test_merge_upsert_idempotent(spark, table_dir):
    updates = spark.createDataFrame(
        [(2, "2024-01-01", 99.0)], "k long, day string, v double"
    )
    merge_upsert(spark, table_dir, updates, key="k", partition_col="day")
    once = _rows(spark, table_dir)
    merge_upsert(spark, table_dir, updates, key="k", partition_col="day")
    assert _rows(spark, table_dir) == once


def test_compact_small_files(spark):
    d = tempfile.mkdtemp(prefix="compact_")
    shutil.rmtree(d)
    try:
        spark.range(10_000).repartition(40).write.parquet(d)
        before = len(glob.glob(os.path.join(d, "*.parquet")))
        assert before == 40
        n_before, n_after = compact_small_files(
            spark, d, target_file_bytes=10 * 1024 * 1024
        )
        assert (n_before, n_after) == (40, 1)
        back = spark.read.parquet(d)
        assert back.count() == 10_000
        assert back.agg(F.sum("id")).collect()[0][0] == sum(range(10_000))
    finally:
        shutil.rmtree(d, ignore_errors=True)
