"""Cardinality sketches: python-reference register parity, merge laws,
estimator accuracy, exactness below capacity, and validation.

The merge laws are the load-bearing property at 100 TB: a sketch built
over the whole corpus must equal the merge of sketches built over any
split of it — that is what makes the aggregate map-side combinable and
the saved state reusable across days/tables.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators import sketches as SK


def _h60(v: str) -> int:
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _values_df(spark, n, prefix="v", dup=1):
    rows = [(f"{prefix}{i}",) for i in range(n)] * dup
    return spark.createDataFrame(rows, "val string")


# --------------------------------------------------------------------------
# KMV
# --------------------------------------------------------------------------


def test_kmv_exact_below_capacity(spark):
    df = _values_df(spark, 40, dup=3)  # duplicates must not inflate
    sk = SK.kmv_sketch(df, "val", k=64)
    est = SK.kmv_estimate(sk, k=64).collect()[0]
    assert est.n_kept == 40
    assert est.est_distinct == 40.0


def test_kmv_estimate_accuracy(spark):
    n = 5000
    df = _values_df(spark, n)
    sk = SK.kmv_sketch(df, "val", k=256)
    est = SK.kmv_estimate(sk, k=256).collect()[0]
    # KMV rel std err ≈ 1/sqrt(k-2) ≈ 6.3%; allow 4σ
    assert abs(est.est_distinct - n) / n < 0.25


def test_kmv_matches_python_reference(spark):
    df = _values_df(spark, 300)
    got = sorted(r.h for r in SK.kmv_sketch(df, "val", k=32).collect())
    want = sorted(_h60(f"v{i}") for i in range(300))[:32]
    assert got == want


def test_kmv_merge_law(spark):
    whole = _values_df(spark, 400)
    a = whole.where(F.col("val") < "v2")  # lexicographic split
    b = whole.where(~(F.col("val") < "v2"))
    merged = SK.kmv_merge(
        SK.kmv_sketch(a, "val", k=48), SK.kmv_sketch(b, "val", k=48), k=48
    )
    direct = SK.kmv_sketch(whole, "val", k=48)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in direct.collect()
    )


def test_kmv_grouped(spark):
    df = spark.createDataFrame(
        [(f"g{i % 2}", f"v{i}") for i in range(200)], "grp string, val string"
    )
    sk = SK.kmv_sketch(df, "val", k=16, by=["grp"])
    counts = {r.grp: r.n_kept for r in SK.kmv_estimate(sk, k=16, by=["grp"]).collect()}
    assert counts == {"g0": 16, "g1": 16}
    # per-group sketch = python k-smallest of that group's hashes
    got = sorted(r.h for r in sk.where(F.col("grp") == "g0").collect())
    want = sorted(_h60(f"v{i}") for i in range(0, 200, 2))[:16]
    assert got == want


def test_kmv_validates_k(spark):
    with pytest.raises(ValueError):
        SK.kmv_sketch(_values_df(spark, 5), "val", k=1)


# --------------------------------------------------------------------------
# HLL
# --------------------------------------------------------------------------


def _py_hll_registers(values, b):
    wbits = 60 - b
    regs = {}
    for v in values:
        h = _h60(v)
        bucket = h >> wbits
        rest = h & ((1 << wbits) - 1)
        rho = (wbits + 1) if rest == 0 else wbits + 1 - rest.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_hll_estimate(regs, b):
    m = 2**b
    zeros = m - len(regs)
    s = sum(2.0**-r for r in regs.values()) + zeros
    raw = SK._alpha(m) * m * m / s
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw


def test_hll_registers_match_python_reference(spark):
    df = _values_df(spark, 500, dup=2)
    got = {r.bucket: r.rho for r in SK.hll_sketch(df, "val", b=6).collect()}
    assert got == _py_hll_registers([f"v{i}" for i in range(500)], 6)


def test_hll_estimate_matches_python_reference(spark):
    for n in (30, 500, 5000):  # 30 exercises the linear-counting branch
        df = _values_df(spark, n, prefix=f"x{n}_")
        est = SK.hll_estimate(SK.hll_sketch(df, "val", b=6), b=6).collect()[0]
        regs = _py_hll_registers([f"x{n}_{i}" for i in range(n)], 6)
        assert est.est_distinct == pytest.approx(_py_hll_estimate(regs, 6), abs=1e-9)
        assert est.empty_registers == 64 - len(regs)


def test_hll_estimate_accuracy(spark):
    n = 20000
    df = _values_df(spark, n)
    est = SK.hll_estimate(SK.hll_sketch(df, "val", b=8), b=8).collect()[0]
    # rel std err ≈ 1.04/sqrt(256) ≈ 6.5%; allow 4σ
    assert abs(est.est_distinct - n) / n < 0.26


def test_hll_merge_law(spark):
    whole = _values_df(spark, 1000)
    a = whole.where(F.col("val") < "v5")
    b = whole.where(~(F.col("val") < "v5"))
    merged = SK.hll_merge(SK.hll_sketch(a, "val", b=7), SK.hll_sketch(b, "val", b=7))
    direct = SK.hll_sketch(whole, "val", b=7)
    assert sorted((r.bucket, r.rho) for r in merged.collect()) == sorted(
        (r.bucket, r.rho) for r in direct.collect()
    )


def test_hll_duplicates_do_not_move_registers(spark):
    once = SK.hll_sketch(_values_df(spark, 100, dup=1), "val", b=6)
    thrice = SK.hll_sketch(_values_df(spark, 100, dup=3), "val", b=6)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, thrice.collect()))


def test_hll_validates_b(spark):
    with pytest.raises(ValueError):
        SK.hll_sketch(_values_df(spark, 5), "val", b=2)


def test_hll_sketch_single_aggregate_plan(spark):
    """The register build must be ONE partial-aggregatable shuffle — no
    distinct pre-pass, no window."""
    df = _values_df(spark, 50)
    explained = SK.hll_sketch(df, "val", b=6)._jdf.queryExecution().executedPlan().toString()
    assert explained.count("Exchange") == 1
    assert "Window" not in explained


# --------------------------------------------------------------------------
# Bottom-k sample / quantile sketch
# --------------------------------------------------------------------------


def test_bottomk_matches_python_reference_and_layout_invariant(spark):
    df = spark.createDataFrame(
        [(i, float(i * 7 % 100)) for i in range(500)], "id long, v double"
    )
    want_ids = sorted(range(500), key=lambda i: (_h60(str(i)), i))[:32]
    for parts in (1, 11):
        got = SK.bottomk_rows(df.repartition(parts), 32, ["id"], keep=["v"])
        assert sorted(r.id for r in got.collect()) == sorted(want_ids)


def test_bottomk_merge_property(spark):
    """bottom-k of the whole == k-smallest of the union of the parts'
    bottom-k — the mergeability that makes the sample coordinatable."""
    df = spark.createDataFrame([(i,) for i in range(600)], "id long")
    a = SK.bottomk_rows(df.where(F.col("id") < 300), 24, ["id"])
    b = SK.bottomk_rows(df.where(F.col("id") >= 300), 24, ["id"])
    merged = SK.bottomk_rows(a.unionByName(b), 24, ["id"])
    direct = SK.bottomk_rows(df, 24, ["id"])
    assert sorted(r.id for r in merged.collect()) == sorted(
        r.id for r in direct.collect()
    )


def test_quantile_sketch_exact_below_capacity(spark):
    rows = [("g", i, float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, id long, v double")
    got = SK.quantile_sketch(
        df, "v", ["id"], qs=(0.5,), k=200, by=["grp"]
    ).collect()[0]
    assert got.n_sampled == 100
    assert got.p50 == pytest.approx(49.5)  # exact interpolated median


def test_quantile_sketch_accuracy_uniform(spark):
    n = 20000
    df = spark.createDataFrame(
        [(i, float(_h60(f"u{i}") % 10**6) / 10**6) for i in range(n)],
        "id long, v double",
    )
    got = SK.quantile_sketch(df, "v", ["id"], qs=(0.5, 0.9), k=512).collect()[0]
    # DKW rank error ~1.36/sqrt(512) ≈ 6% at 95%; uniform values make
    # value error ≈ rank error
    assert abs(got.p50 - 0.5) < 0.1
    assert abs(got.p90 - 0.9) < 0.1


def test_bottomk_validates_k(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        SK.bottomk_rows(df, 0, ["id"])


def test_hll_xxhash_variant_accuracy_and_merge(spark):
    """The production hash keeps every estimator property (no python
    parity possible — xxhash64 is JVM-side — so accuracy + merge law
    stand in)."""
    n = 20000
    df = _values_df(spark, n)
    est = SK.hll_estimate(
        SK.hll_sketch(df, "val", b=8, hash="xxhash64"), b=8
    ).collect()[0]
    assert abs(est.est_distinct - n) / n < 0.26
    a = df.where(F.col("val") < "v5")
    b = df.where(~(F.col("val") < "v5"))
    merged = SK.hll_merge(
        SK.hll_sketch(a, "val", b=7, hash="xxhash64"),
        SK.hll_sketch(b, "val", b=7, hash="xxhash64"),
    )
    direct = SK.hll_sketch(df, "val", b=7, hash="xxhash64")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_kmv_xxhash_variant_accuracy(spark):
    df = _values_df(spark, 5000)
    est = SK.kmv_estimate(
        SK.kmv_sketch(df, "val", k=256, hash="xxhash64"), k=256
    ).collect()[0]
    assert abs(est.est_distinct - 5000) / 5000 < 0.25


def test_unknown_hash_rejected(spark):
    with pytest.raises(ValueError):
        SK.kmv_sketch(_values_df(spark, 5), "val", k=4, hash="sha1")


# --------------------------------------------------------------------------
# Count-min sketch
# --------------------------------------------------------------------------


def _py_cms(values, depth, width):
    grid = {}
    for v in values:
        for j in range(depth):
            slot = _h60(f"{v}#cms{j}") % width
            grid[(j, slot)] = grid.get((j, slot), 0) + 1
    return grid


def test_cms_grid_matches_python_reference(spark):
    vals = [f"v{i % 60}" for i in range(600)]
    df = spark.createDataFrame([(v,) for v in vals], "val string")
    got = {
        (r.row, r.slot): r.cnt
        for r in SK.cms_sketch(df, "val", depth=3, width=64).collect()
    }
    assert got == _py_cms(vals, 3, 64)


def test_cms_never_undercounts_and_is_tight_when_sparse(spark):
    # skewed counts: v0 appears 300x, v1..v29 10x each
    vals = ["v0"] * 300 + [f"v{i}" for i in range(1, 30) for _ in range(10)]
    df = spark.createDataFrame([(v,) for v in vals], "val string")
    sk = SK.cms_sketch(df, "val", depth=4, width=512)
    probes = spark.createDataFrame([(f"v{i}",) for i in range(30)], "val string")
    est = {
        r.val: r.est_count
        for r in SK.cms_estimate(sk, probes, "val", depth=4, width=512).collect()
    }
    exact = {"v0": 300, **{f"v{i}": 10 for i in range(1, 30)}}
    for v, c in exact.items():
        assert est[v] >= c                     # CMS never under-counts
    # 30 keys in 512 slots over 4 rows: min-row is collision-free whp
    assert est["v0"] == 300
    assert sum(est[v] == exact[v] for v in exact) >= 28


def test_cms_merge_law(spark):
    vals = [f"v{i % 40}" for i in range(400)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i long, val string")
    a = SK.cms_sketch(df.where(F.col("i") < 200), "val", depth=3, width=64)
    b = SK.cms_sketch(df.where(F.col("i") >= 200), "val", depth=3, width=64)
    merged = SK.cms_merge(a, b)
    direct = SK.cms_sketch(df, "val", depth=3, width=64)
    assert sorted(map(tuple, merged.select("row", "slot", "cnt").collect())) == sorted(
        map(tuple, direct.select("row", "slot", "cnt").collect())
    )


def test_cms_absent_probe_estimates_bounded(spark):
    df = spark.createDataFrame([("x",)] * 5, "val string")
    sk = SK.cms_sketch(df, "val", depth=4, width=256)
    probes = spark.createDataFrame([("never-seen",)], "val string")
    est = SK.cms_estimate(sk, probes, "val", depth=4, width=256).collect()[0]
    assert 0 <= est.est_count <= 5  # only collision mass, likely 0


def test_cms_validates_params(spark):
    df = spark.createDataFrame([("x",)], "val string")
    with pytest.raises(ValueError):
        SK.cms_sketch(df, "val", depth=0)


def test_kmv_set_estimates_accuracy_and_exactness(spark):
    """Intersection/Jaccard estimates from coordinated sketches: exact
    below capacity, ~1/sqrt(k) error above it."""
    from pyspark.sql import functions as F

    from financial_big_data_spark.operators.sketches import (
        kmv_set_estimates,
        kmv_sketch,
    )

    # EXACT case: tiny sets, sketches under capacity
    a_small = spark.range(0, 30).select(F.col("id").cast("string").alias("v"))
    b_small = spark.range(20, 60).select(F.col("id").cast("string").alias("v"))
    r = kmv_set_estimates(
        kmv_sketch(a_small, "v", k=256), kmv_sketch(b_small, "v", k=256), k=256
    ).collect()[0]
    assert r.est_union == 60.0
    assert r.est_jaccard == pytest.approx(10 / 60)
    assert r.est_intersection == pytest.approx(10.0)

    # approximate case: 20k vs 20k with 10k overlap, k=256
    a = spark.range(0, 20_000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(10_000, 30_000).select(F.col("id").cast("string").alias("v"))
    r = kmv_set_estimates(
        kmv_sketch(a, "v", k=256), kmv_sketch(b, "v", k=256), k=256
    ).collect()[0]
    true_j = 10_000 / 30_000
    assert r.est_union == pytest.approx(30_000, rel=0.15)
    assert r.est_jaccard == pytest.approx(true_j, abs=3 * (true_j * (1 - true_j) / 256) ** 0.5)
    assert r.est_intersection == pytest.approx(10_000, rel=0.3)


def test_kmv_set_estimates_grouped(spark):
    from pyspark.sql import functions as F

    from financial_big_data_spark.operators.sketches import (
        kmv_set_estimates,
        kmv_sketch,
    )

    rows_a = [("g1", str(i)) for i in range(50)] + [("g2", str(i)) for i in range(10)]
    rows_b = [("g1", str(i)) for i in range(25, 75)] + [("g2", str(i)) for i in range(10, 20)]
    a = spark.createDataFrame(rows_a, "g string, v string")
    b = spark.createDataFrame(rows_b, "g string, v string")
    out = {
        r.g: r
        for r in kmv_set_estimates(
            kmv_sketch(a, "v", k=128, by=["g"]),
            kmv_sketch(b, "v", k=128, by=["g"]),
            k=128,
            by=["g"],
        ).collect()
    }
    assert out["g1"].est_intersection == pytest.approx(25.0)
    assert out["g2"].est_intersection == pytest.approx(0.0)
    assert out["g2"].est_union == 20.0
