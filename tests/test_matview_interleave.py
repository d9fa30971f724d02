"""Refresh-vs-DML interleave pins (VERDICT r11 #4): a base-table commit
landing BETWEEN a refresh's delta read and its view commit must neither
be claimed by that refresh (its base_version pin) nor be lost — the next
refresh catches up and the view converges to a from-scratch recompute.

Why this is safe by design (the property under pin): ``refresh_matview``
pins ``v1 = current_version(base)`` ONCE at entry and works off the two
pinned manifests' concrete file lists; versioned data files are immutable
and a concurrent upsert only ADDS files + a new manifest, so the pinned
delta scan is unaffected and the published meta records exactly v1. The
interleaved commit becomes the next refresh's symmetric difference.

The interleave is simulated by hooking the refresh's first manifest load
of the VIEW path — the moment after the delta derivation is fixed and
before the view's copy-on-write commit — and firing a real
``upsert_version``/``append_version`` on the base right there. All four
maintenance families are covered (sum/count ±delta, min/max partials
sidecar, mixed per-column spec, HLL-distinct partials).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import financial_big_data_spark.sources.matview as MV
from financial_big_data_spark.sources.matview import (
    create_distinct_matview,
    create_matview,
    read_distinct_matview,
    read_matview,
    refresh_distinct_matview,
    refresh_matview,
)
from financial_big_data_spark.sources.versioned import (
    append_version,
    current_version,
    upsert_version,
    write_version,
)


@pytest.fixture()
def paths():
    d = tempfile.mkdtemp(prefix="mv_interleave_")
    yield (
        os.path.join(d, "base"),
        os.path.join(d, "view"),
        os.path.join(d, "fresh_base"),
        os.path.join(d, "fresh_view"),
    )
    shutil.rmtree(d, ignore_errors=True)


def _base(spark, n=300):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )


def _upd(spark, lo, hi, scale):
    return spark.range(lo, hi).select(
        F.col("id"), (F.col("id") % 7).alias("g"),
        (F.col("id") * scale).alias("v"),
    )


def _hook_view_manifest_load(monkeypatch, view_path, dml):
    """Fire ``dml`` exactly once, at the refresh's first manifest load of
    the view (or its nested partials sidecar) — after the delta
    derivation is pinned, before the view commit."""
    orig = MV._load_manifest
    state = {"fired": False}

    def hooked(path, version):
        if not state["fired"] and str(path).startswith(view_path):
            state["fired"] = True
            dml()
        return orig(path, version)

    monkeypatch.setattr(MV, "_load_manifest", hooked)
    return state


def _rows(df, ndigits=6):
    out = set()
    for r in df.collect():
        out.add(
            tuple(
                round(x, ndigits) if isinstance(x, float) else x
                for x in r
            )
        )
    return out


@pytest.mark.parametrize(
    "family_kw",
    [
        pytest.param({}, id="sum_count"),
        pytest.param({"aggs": ("sum", "count", "min", "max")}, id="minmax"),
        pytest.param({"value": {"v": ["sum"], "v2": ["min", "max"]}}, id="mixed"),
    ],
)
def test_upsert_interleaved_with_refresh_converges(
    spark, paths, monkeypatch, family_kw
):
    base, view, fresh_base, fresh_view = paths
    two_vals = isinstance(family_kw.get("value"), dict)
    df = _base(spark)
    if two_vals:
        df = df.withColumn("v2", F.col("v") * 2 + 1)
    write_version(df, base, key="id")
    kw = {"value": "v", **family_kw}
    create_matview(spark, base, view, group="g", **kw)

    def mk_upd(lo, hi, scale):
        u = _upd(spark, lo, hi, scale)
        if two_vals:
            # v2 deliberately UNCHANGED from create time for overlapping
            # ids (the partials family maintains a column the ±delta
            # never touches) — new ids get fresh v2
            u = u.withColumn("v2", F.col("id") * 1.5 * 2 + 1)
        return u

    # the refresh under test covers v1 -> v2
    upsert_version(spark, base, mk_upd(10, 40, 3.0), key="id",
                   dedupe_updates=False)
    # ...and v3 lands mid-refresh (update of OTHER keys + inserts —
    # including a new maximum for the minmax families)
    interleaved = mk_upd(250, 340, 9.0)

    state = _hook_view_manifest_load(
        monkeypatch, view,
        lambda: upsert_version(spark, base, interleaved, key="id",
                               dedupe_updates=False),
    )
    res = refresh_matview(spark, base, view, key="id")
    assert state["fired"], "interleave hook never fired — test is vacuous"
    # the refresh must publish the version it PINNED (2), not the
    # concurrent commit it never saw
    assert res["base_version"] == 2
    assert MV._read_meta(view)["base_version"] == 2
    assert current_version(base) == 3

    # the interleaved commit is the next refresh's delta; convergence:
    refresh_matview(spark, base, view, key="id")
    assert MV._read_meta(view)["base_version"] == 3

    # view == a from-scratch view of the final base state (same creation
    # code path → same column naming/typing; fresh fixture, no interleave)
    from financial_big_data_spark.sources.versioned import read_version

    write_version(read_version(spark, base), fresh_base, key="id")
    create_matview(spark, fresh_base, fresh_view, group="g", **kw)
    assert _rows(read_matview(spark, view)) == _rows(
        read_matview(spark, fresh_view)
    )


def test_append_interleaved_with_distinct_refresh_converges(
    spark, paths, monkeypatch
):
    """HLL-distinct partials family: an append landing mid-refresh is
    picked up by the NEXT refresh; registers converge to a from-scratch
    sketch of the final state."""
    base, view, fresh_base, fresh_view = paths
    ev = spark.range(300).select(
        F.col("id"), (F.col("id") % 7).alias("g"),
        (F.col("id") % 50).cast("string").alias("u"),
    )
    write_version(ev, base, key="id")
    create_distinct_matview(
        spark, base, view, group="g", value="u", b=6, maintain="partials"
    )
    batch2 = spark.range(300, 400).select(
        F.col("id"), (F.col("id") % 7).alias("g"),
        (F.col("id") % 90).cast("string").alias("u"),
    )
    append_version(spark, base, batch2, key="id")
    batch3 = spark.range(400, 480).select(
        F.col("id"), (F.col("id") % 7).alias("g"),
        (F.col("id") % 130).cast("string").alias("u"),
    )
    state = _hook_view_manifest_load(
        monkeypatch, view,
        lambda: append_version(spark, base, batch3, key="id"),
    )
    refresh_distinct_matview(spark, base, view)
    assert state["fired"]
    assert MV._read_meta(view)["base_version"] == 2
    assert current_version(base) == 3
    refresh_distinct_matview(spark, base, view)
    assert MV._read_meta(view)["base_version"] == 3

    from financial_big_data_spark.sources.versioned import read_version

    write_version(read_version(spark, base), fresh_base, key="id")
    create_distinct_matview(
        spark, fresh_base, fresh_view, group="g", value="u", b=6,
        maintain="partials",
    )
    assert _rows(read_distinct_matview(spark, view)) == _rows(
        read_distinct_matview(spark, fresh_view)
    )
