"""Pins for ev_cube (CUBE = one Expand pass, not unioned scans) and
doc_canonical (quality-ranked cluster survivor via min-struct agg)."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_big_data_spark.queries import q_doc_canonical, q_ev_cube

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cube_is_one_expand_pass(spark):
    df = q_ev_cube(spark, SF)
    plan = _plan(df)
    assert "Expand" in plan
    assert plan.count("FileScan parquet") == 1  # one scan feeds all 4 sets
    assert "Union" not in plan


def test_cube_grouping_sets_consistent(spark):
    rows = q_ev_cube(spark, SF).collect()
    by_set = {}
    for r in rows:
        by_set.setdefault(r.grouping_set, []).append(r)
    # 4 grouping sets: (type,hr)=0, type-only=1, hr-only=2, grand=3
    assert set(by_set) == {0, 1, 2, 3}
    grand = by_set[3][0]
    assert grand.n == sum(r.n for r in by_set[0])
    assert grand.n == sum(r.n for r in by_set[1])


def test_canonical_keeps_longest_member(spark):
    df = q_doc_canonical(spark, SF)
    plan = _plan(df)
    assert "Window" not in plan  # min-struct agg, no per-cluster rank
    rows = df.collect()
    assert rows
    # every canonical's id belongs to its own cluster and sizes are sane
    for r in rows:
        assert r.cluster_size >= 2
        assert r.n_discarded == r.cluster_size - 1
        assert r.kept_score > 0
