"""Incrementally-maintained materialized aggregates over versioned tables.

A materialized view here is a grouped aggregate (per-group SUM and COUNT —
the self-maintainable aggregates; AVG derives as sum/count) of a versioned
table (sources/versioned.py), stored AS a versioned table itself keyed by
the group column. Refreshing after the base table advances applies only the
DELTA contributed by changed keys:

    new_view[g] = old_view[g]
                + sum/count over NEW rows of changed keys in group g
                - sum/count over OLD rows of changed keys in group g

so a refresh scans O(files overlapping the changed-key range) of two base
snapshots (manifest footer-range pruning, the same contract `upsert_version`
uses) plus the view — never the full base table. At 100 TB this is the
difference between "recompute the corpus aggregate" and "touch the day's
partitions".

Deliberate limits, stated rather than hidden:

- Only SUM/COUNT (and derived AVG) are maintained. MIN/MAX are NOT
  self-maintainable under deletes (removing the current max forces a
  full-group rescan); asking for them raises instead of silently
  recomputing.
- The changed-key set comes from `changefeed` (a fingerprint diff of the
  two snapshots — one full pass of each) unless the caller passes the
  update batch it already holds via ``changed_keys``; writers that know
  their deltas should pass them and skip the diff entirely.
- Groups whose count reaches 0 are DELETED from the view (not left as
  zero rows), so the view's row set always equals `SELECT group FROM base
  GROUP BY group`.

Reference parity: the reference engine's pandas pipelines recompute every
aggregate from the raw frame on each run (e.g. market_analysis.py's
per-regime summaries); this module is the Spark-first replacement that
keeps those summaries current under DML without the rescan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .versioned import (
    changefeed,
    current_version,
    delete_version,
    read_version,
    read_version_pruned,
    upsert_version,
    write_version,
)

_SUPPORTED = ("sum", "count")


def _meta_path(view_path: str) -> str:
    return os.path.join(view_path, "_matview.json")


def _read_meta(view_path: str) -> dict:
    with open(_meta_path(view_path)) as fh:
        return json.load(fh)


def _write_meta(view_path: str, meta: dict) -> None:
    tmp = _meta_path(view_path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, _meta_path(view_path))  # atomic, like CURRENT


def _aggregate(rows: DataFrame, group: str, value: str) -> DataFrame:
    return rows.groupBy(group).agg(
        F.sum(F.col(value)).alias("agg_sum"),
        F.count(F.lit(1)).alias("agg_count"),
    )


def create_matview(
    spark: SparkSession,
    table_path: str,
    view_path: str,
    group: str,
    value: str,
    aggs: tuple[str, ...] = ("sum", "count"),
) -> int:
    """Materialize ``SELECT group, sum(value), count(*) FROM base`` as a
    versioned table at ``view_path`` (key = the group column) and record
    which base snapshot it reflects. Returns the view's version (1)."""
    for a in aggs:
        if a not in _SUPPORTED:
            raise ValueError(
                f"aggregate {a!r} is not self-maintainable under deletes; "
                f"supported: {_SUPPORTED} (avg derives as sum/count)"
            )
    base_v = current_version(table_path)
    agg = _aggregate(read_version(spark, table_path, base_v), group, value)
    view_v = write_version(agg, view_path, key=group)
    _write_meta(
        view_path,
        {"base_version": base_v, "group": group, "value": value},
    )
    return view_v


def read_matview(spark: SparkSession, view_path: str) -> DataFrame:
    """Current view contents: (group, agg_sum, agg_count)."""
    return read_version(spark, view_path)


def refresh_matview(
    spark: SparkSession,
    table_path: str,
    view_path: str,
    key: str,
    changed_keys: DataFrame | None = None,
) -> dict:
    """Advance the view to the base table's CURRENT snapshot by delta.

    ``key`` is the base table's row key. ``changed_keys`` (one column,
    the key) lets a writer that already knows its update batch skip the
    changefeed diff; when omitted the diff runs between the recorded and
    current base versions. Returns {"base_version": v, "groups_upserted":
    n, "groups_deleted": n} — a no-op refresh returns zeros.
    """
    meta = _read_meta(view_path)
    group, value = meta["group"], meta["value"]
    v0, v1 = meta["base_version"], current_version(table_path)
    if v1 == v0:
        return {"base_version": v1, "groups_upserted": 0, "groups_deleted": 0}
    if v1 < v0:
        raise ValueError(
            f"view at {view_path} reflects base version {v0} but the table "
            f"is at {v1} — the base table went backwards (vacuum/rollback?); "
            "rebuild with create_matview"
        )
    if changed_keys is None:
        changed_keys = changefeed(spark, table_path, v0, v1, key).select(key)
    chg = changed_keys.select(key).distinct()
    # bounded metadata: the changed-key RANGE routes the footer pruning,
    # the semi-join applies the exact set — same discipline as upsert
    rng = chg.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
    if rng["lo"] is None:
        _write_meta(view_path, {**meta, "base_version": v1})
        return {"base_version": v1, "groups_upserted": 0, "groups_deleted": 0}

    def contributions(version: int, sign: int) -> DataFrame:
        rows = read_version_pruned(
            spark, table_path, key, rng["lo"], rng["hi"], version=version
        ).join(chg, on=key, how="left_semi")
        return rows.groupBy(group).agg(
            (F.lit(sign) * F.sum(F.col(value))).alias("d_sum"),
            (F.lit(sign) * F.count(F.lit(1))).alias("d_count"),
        )

    delta = (
        contributions(v0, -1)
        .unionByName(contributions(v1, +1))
        .groupBy(group)
        .agg(F.sum("d_sum").alias("d_sum"), F.sum("d_count").alias("d_count"))
    )
    view = read_version(spark, view_path)
    merged = (
        view.join(delta, on=group, how="full_outer")
        .select(
            F.col(group),
            (F.coalesce("agg_sum", F.lit(0.0)) + F.coalesce("d_sum", F.lit(0.0))).alias(
                "agg_sum"
            ),
            (
                F.coalesce("agg_count", F.lit(0)) + F.coalesce("d_count", F.lit(0))
            ).alias("agg_count"),
        )
    )
    # only groups the delta touched change; send exactly those through the
    # view's copy-on-write upsert (untouched view files carry by reference)
    # — persisted ONCE: counts + upsert + delete all consume this frame,
    # and without the pin each would re-run the two pruned base scans and
    # the full-outer merge (4x the refresh I/O)
    touched = merged.join(delta.select(group), on=group, how="left_semi").persist()
    try:
        dead = touched.where(F.col("agg_count") <= 0).select(group)
        live = touched.where(F.col("agg_count") > 0)
        n_up = live.count()
        n_dead = dead.count()
        if n_up:
            upsert_version(spark, view_path, live, key=group, dedupe_updates=False)
        if n_dead:
            delete_version(spark, view_path, dead, key=group)
    finally:
        touched.unpersist()
    _write_meta(view_path, {**meta, "base_version": v1})
    return {
        "base_version": v1,
        "groups_upserted": int(n_up),
        "groups_deleted": int(n_dead),
    }
