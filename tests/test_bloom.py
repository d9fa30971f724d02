"""Bloom sidecar pruning (sources/bloom.py + versioned integration):
no false negatives, useful false-positive rate, insert-of-new-keys
rewrites nothing, point-set reads touch only matching files, vacuum
removes sidecars with their files."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.sources.bloom import (
    Bloom,
    bloom_build,
    load_sidecar,
    sidecar_path,
)
from financial_big_data_spark.sources.versioned import (
    current_version,
    delete_version,
    read_version,
    read_version_keys,
    upsert_version,
    vacuum,
    write_version,
)


@pytest.fixture()
def vpath():
    d = tempfile.mkdtemp(prefix="bloom_")
    yield os.path.join(d, "table")
    shutil.rmtree(d, ignore_errors=True)


def _base(spark, n=1000):
    # even ids only: every odd id is inside the key range but absent
    return spark.range(n).select(
        (F.col("id") * 2).alias("id"), (F.col("id") * 1.0).alias("v")
    )


def test_bloom_no_false_negatives_and_bounded_fpr():
    keys = [str(i) for i in range(0, 2000, 2)]
    b = Bloom(bloom_build(keys))
    assert all(b.might_contain(k) for k in keys)
    absent = [str(i) for i in range(1, 20001, 2)]
    fpr = sum(b.might_contain(k) for k in absent) / len(absent)
    assert fpr < 0.05, fpr


def test_bloom_build_deterministic():
    keys = [str(i) for i in range(500)]
    assert bloom_build(keys) == bloom_build(list(keys))


def test_sidecars_written_with_every_batch(spark, vpath):
    write_version(_base(spark), vpath, key="id", n_files=4)
    from financial_big_data_spark.sources.versioned import _load_manifest

    files = _load_manifest(vpath, None)["files"]
    assert len(files) == 4
    for f in files:
        b = load_sidecar(f)
        assert b is not None
        # the file's own keys all hit
        ids = [str(r.id) for r in spark.read.parquet(f).select("id").collect()]
        assert all(b.might_contain(k) for k in ids)


def test_upsert_absent_keys_rewrites_nothing(spark, vpath):
    """Keys inside the table's range but absent (odd ids): range pruning
    would rewrite every overlapping file; the Bloom sidecar proves the
    miss, so the new snapshot = old files + one insert-only file."""
    write_version(_base(spark), vpath, key="id", n_files=4)
    from financial_big_data_spark.sources.versioned import _load_manifest

    old_files = set(_load_manifest(vpath, None)["files"])
    inserts = spark.createDataFrame(
        [(3, 100.0), (501, 101.0), (1203, 102.0)], "id long, v double"
    )
    upsert_version(spark, vpath, inserts, key="id")
    new_files = set(_load_manifest(vpath, None)["files"])
    assert old_files < new_files  # every old file carried by reference
    assert (
        read_version(spark, vpath).count()
        == 1000 + 3
    )


def test_delete_absent_keys_is_metadata_only(spark, vpath):
    write_version(_base(spark), vpath, key="id", n_files=4)
    from financial_big_data_spark.sources.versioned import _load_manifest

    old_files = set(_load_manifest(vpath, None)["files"])
    dels = spark.createDataFrame([(7,), (999,)], "id long")
    delete_version(spark, vpath, dels, key="id")
    assert set(_load_manifest(vpath, None)["files"]) == old_files
    assert read_version(spark, vpath).count() == 1000


def test_point_read_miss_touches_zero_files(spark, vpath):
    write_version(_base(spark), vpath, key="id", n_files=4)
    hit = read_version_keys(spark, vpath, [4, 8], key="id")
    assert {r.id for r in hit.collect()} == {4, 8}
    miss = read_version_keys(spark, vpath, [7, 777], key="id")
    # zero rows AND (whitebox) zero files picked: the plan reads nothing
    assert miss.count() == 0
    plan = miss._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan or "false" in plan.lower()


def test_correctness_on_bloom_false_positive_path(spark, vpath):
    """Whatever the sidecars claim, matched keys update and the exact
    predicate filters — hammer 50 present + 50 absent keys."""
    write_version(_base(spark), vpath, key="id", n_files=4)
    probe = list(range(0, 100))  # evens present, odds absent
    got = {r.id for r in read_version_keys(spark, vpath, probe, key="id").collect()}
    assert got == set(range(0, 100, 2))


def test_vacuum_removes_sidecars(spark, vpath):
    write_version(_base(spark), vpath, key="id", n_files=2)
    from financial_big_data_spark.sources.versioned import _load_manifest

    v1_files = _load_manifest(vpath, None)["files"]
    # full rewrite → v1 files become exclusive to v1
    write_version(_base(spark).withColumn("v", F.col("v") + 1), vpath, key="id")
    vacuum(vpath, keep_last=1)
    for f in v1_files:
        assert not os.path.exists(f)
        assert not os.path.exists(sidecar_path(f))


def test_streaming_matview_still_green_with_blooms(spark, vpath):
    """The matview delta refresh sits on upsert/delete — re-check the
    arithmetic end-to-end now that blooms prune the file sets."""
    from financial_big_data_spark.sources.matview import (
        create_matview,
        read_matview,
        refresh_matview,
    )

    d = os.path.dirname(vpath)
    view = os.path.join(d, "view")
    write_version(
        spark.range(100).select(
            F.col("id"), (F.col("id") % 5).alias("g"), (F.col("id") * 1.0).alias("v")
        ),
        vpath,
        key="id",
    )
    create_matview(spark, vpath, view, group="g", value="v")
    ups = spark.createDataFrame([(200, 0, 50.0), (3, 3, 30.0)], "id long, g long, v double")
    upsert_version(spark, vpath, ups, key="id")
    refresh_matview(spark, vpath, view, key="id", changed_keys=ups.select("id"))
    expect = {
        (r.g, round(r.s, 6), r.c)
        for r in read_version(spark, vpath)
        .groupBy("g")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    got = {
        (r.g, round(r.agg_sum, 6), r.agg_count)
        for r in read_matview(spark, view).collect()
    }
    assert got == expect


def test_mismatched_probe_types_fall_back_to_ranges(spark, vpath):
    """A probe whose Python str() disagrees with Spark's string cast
    (float 4.0 against a bigint column) must NOT hash the sidecars —
    a hash on '4.0' vs the stored '4' would be a false NEGATIVE
    (silently dropped rows). The guard falls back to footer-range
    pruning, which still finds the row (review r6)."""
    write_version(_base(spark), vpath, key="id", n_files=4)
    got = {r.id for r in read_version_keys(spark, vpath, [4.0, 8.0], key="id").collect()}
    assert got == {4, 8}
    # bool probes render 'True', Spark renders 'true'/'1' — also guarded
    from financial_big_data_spark.sources.bloom import probe_values_safe

    assert probe_values_safe("bigint", [4, 8])
    assert not probe_values_safe("bigint", [4.0])
    assert not probe_values_safe("bigint", [True])
    assert probe_values_safe("string", ["a"])
    assert not probe_values_safe("string", [4])
    assert not probe_values_safe("timestamp", ["2024-01-01 00:00:00"])


def test_hashed_probe_matches_keyed_probe():
    from financial_big_data_spark.sources.bloom import _h2

    keys = [str(i) for i in range(100)]
    b = Bloom(bloom_build(keys))
    probes = [str(i) for i in range(0, 300, 7)]
    hashes = [_h2(k) for k in probes]
    assert b.might_contain_any_hashed(hashes) == b.might_contain_any(probes)
    for k in probes:
        h1, h2 = _h2(k)
        assert b.might_contain_hashed(h1, h2) == b.might_contain(k)
