"""Pins for sources/zorder.py: Morton key structure and the actual
data-skipping payoff — a box predicate must overlap strictly fewer files
under the Z-order layout than under an unclustered write of the same
data, measured from parquet FOOTER statistics alone."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.sources.zorder import (
    files_overlapping_box,
    morton_key,
    write_zordered,
    zorder_stats,
)


@pytest.fixture(scope="module")
def xy_df(spark):
    # two INDEPENDENT uniform dimensions — the case a single-column sort
    # cannot serve: sorting by x leaves y spanning the full range per file
    return (
        spark.range(20_000)
        .select(
            F.col("id"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(1000)).alias("x"),
            F.pmod(F.xxhash64(F.col("id") + 7_777_777), F.lit(1000)).alias("y"),
        )
    )


def test_morton_key_orders_locally(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (1000, 1000), (0, 1000)], "x long, y long"
    )
    keys = {
        (r["x"], r["y"]): r["k"]
        for r in df.withColumn("k", morton_key(df, ["x", "y"], bits=4)).collect()
    }
    # near-origin points get small keys; far corner the largest
    assert keys[(0, 0)] <= keys[(1, 1)] < keys[(1000, 1000)]
    # a point extreme in ONE dimension sits between: interleaving splits
    # the difference instead of letting one column dominate
    assert keys[(0, 0)] < keys[(0, 1000)] < keys[(1000, 1000)]


def test_morton_validation(spark, xy_df):
    with pytest.raises(ValueError):
        morton_key(xy_df, [])
    with pytest.raises(ValueError):
        morton_key(xy_df, ["x", "y"], bits=32)


def test_zorder_write_prunes_both_dimensions(spark, xy_df):
    naive_dir = tempfile.mkdtemp(prefix="zorder_naive_")
    z_dir = tempfile.mkdtemp(prefix="zorder_z_")
    try:
        # unclustered baseline with the SAME file count
        xy_df.repartition(8).write.mode("overwrite").parquet(naive_dir)
        write_zordered(xy_df, z_dir, ["x", "y"], bits=8, n_files=8)
        sn = zorder_stats(naive_dir, ["x", "y"])
        sz = zorder_stats(z_dir, ["x", "y"])
        # layout is deterministic (frozen quantile boundaries + preimage
        # routing) — file count is exact, not a band
        assert len(sz) == 8
        # a 10%×10% box in the middle of the space
        box = {"x": (400, 500), "y": (400, 500)}
        naive_hits = files_overlapping_box(sn, box)
        z_hits = files_overlapping_box(sz, box)
        # random layout: every file spans ~everything -> all overlap;
        # the curve layout must prune at least half
        assert naive_hits == len(sn)
        assert z_hits <= len(sz) // 2, (z_hits, len(sz))
        # and single-dimension slices prune too (the multi-dim promise):
        # a 10% edge slice must not touch more than ~2/3 of the files
        for dim in ("x", "y"):
            slice_box = {dim: (0, 99)}
            assert files_overlapping_box(sz, slice_box) <= 2 * len(sz) // 3
        # correctness: the clustered copy holds exactly the same rows
        back = spark.read.parquet(z_dir)
        assert back.count() == xy_df.count()
        assert (
            back.agg(F.sum("x"), F.sum("y")).collect()[0]
            == xy_df.agg(F.sum("x"), F.sum("y")).collect()[0]
        )
    finally:
        shutil.rmtree(naive_dir, ignore_errors=True)
        shutil.rmtree(z_dir, ignore_errors=True)


def test_zorder_write_is_deterministic(spark, xy_df):
    """Two writes of the same frame produce the SAME layout: identical
    per-file footer statistics and per-file row multisets. The engine
    property behind it: frozen quantile boundaries + hash-preimage
    routing, no run-seeded boundary sampling anywhere in the write
    path (the r5 suite flake was exactly this nondeterminism)."""
    dirs = [tempfile.mkdtemp(prefix=f"zorder_det{i}_") for i in (0, 1)]
    try:
        for d in dirs:
            write_zordered(xy_df, d, ["x", "y"], bits=8, n_files=8)
        s0, s1 = (zorder_stats(d, ["x", "y"]) for d in dirs)
        assert [
            (st["min"], st["max"]) for st in s0
        ] == [(st["min"], st["max"]) for st in s1]
        # per-file row-set fingerprints match file-for-file (files sort by
        # part index = partition id, which the preimage routing fixes)
        def file_fps(d):
            import glob as g
            import os

            fps = []
            for f in sorted(g.glob(os.path.join(d, "*.parquet"))):
                r = (
                    spark.read.parquet(f)
                    .agg(
                        F.count("*").alias("n"),
                        F.bit_xor(F.xxhash64("id", "x", "y")).alias("h"),
                    )
                    .first()
                )
                fps.append((r["n"], r["h"]))
            return fps

        assert file_fps(dirs[0]) == file_fps(dirs[1])
    finally:
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)
