"""Streaming keyed upsert sink: continuous ingest into a partitioned
parquet table via ``foreachBatch`` → ``merge_upsert``.

Structured Streaming's file sink is append-only; a continuously-updated
dimension or latest-state table needs MERGE semantics. Lakehouse formats
bring their own streaming MERGE; for the plain-parquet layout this engine
maintains (sources/maintenance.py), the same effect composes from

1. per-micro-batch LAST-WINS key collapse (a keyed window on the declared
   order column — updates for the same key inside one batch can arrive in
   any partition order, so "latest" must be explicit, never positional);
2. partition-scoped MERGE of the collapsed batch (matched keys replaced,
   unmatched target rows survive, untouched partitions byte-identical).

Failure/replay semantics: after a crash the engine re-runs the last
uncommitted micro-batch. The merge is IDEMPOTENT — re-merging the same
(key, value) rows rewrites the same partitions with the same content — so
replays converge to exactly-once TABLE STATE even though ``foreachBatch``
itself is at-least-once (the standard contract for idempotent-sink
streaming writes).

At scale: state lives in the table, not the stream — no watermark, no
state store. Each micro-batch shuffles only on the merge key and rewrites
only touched partitions; a day-partitioned 100 TB table absorbing a
minutely update stream rewrites minutes' worth of partitions, not the
table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.maintenance import merge_upsert


def latest_per_key(batch: DataFrame, key: str, order: str) -> DataFrame:
    """Last-wins collapse: one row per key, highest ``order`` value wins;
    ties break on the stable (order desc, key) — deterministic under any
    partition layout."""
    w = Window.partitionBy(key).orderBy(F.col(order).desc())
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def streaming_upsert(
    stream: DataFrame,
    path: str,
    key: str,
    partition_col: str,
    checkpoint: str,
    order: str,
    available_now: bool = True,
):
    """Start a streaming query that MERGEs each micro-batch into the
    partitioned parquet table at ``path``; returns the StreamingQuery.

    First batch against a missing table bootstraps the partitioned
    layout; later batches go through the partition-scoped MERGE.
    """

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        latest = latest_per_key(batch, key=key, order=order)
        if not os.path.exists(path):
            latest.write.partitionBy(partition_col).parquet(path)
            return
        merge_upsert(
            batch.sparkSession, path, latest, key=key, partition_col=partition_col
        )

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _merge_versioned_batch(batch: DataFrame, path: str, key: str, order: str):
    """The shared micro-batch body of BOTH versioned sinks: empty-batch
    guard → last-wins collapse → versioned upsert, bootstrapping the
    table on the first batch (FileNotFoundError → write_version).
    Returns the collapsed frame, or None when the batch was empty —
    one copy of the merge/bootstrap semantics, so a change to the
    dedupe or bootstrap contract cannot silently miss one sink."""
    from ..sources.versioned import upsert_version, write_version

    if batch.isEmpty():
        return None
    latest = latest_per_key(batch, key=key, order=order).drop(order)
    try:
        upsert_version(batch.sparkSession, path, latest, key=key)
    except FileNotFoundError:
        write_version(latest, path, key=key)
    return latest


def streaming_versioned_upsert_with_matview(
    stream: DataFrame,
    path: str,
    key: str,
    order: str,
    checkpoint: str,
    view_path: str,
    group: str,
    value: str,
    available_now: bool = True,
):
    """``streaming_versioned_upsert`` + a materialized aggregate
    (sources/matview.py) kept current per micro-batch.

    The view refresh takes the DELTA fast path: the batch's own keys are
    the changed-key set, so no changefeed diff runs and the refresh
    touches O(files overlapping the batch's key range) of two base
    snapshots — per-batch maintenance cost scales with the batch, not
    the table. The fast path is only sound when the view lagged exactly
    ONE commit; after a crash between the table commit and the view
    refresh the next batch sees a 2-commit lag and falls back to the
    changefeed diff (catch-up covers the lost batch's keys too), which
    is what makes replay converge — the same at-least-once →
    idempotent-state argument as the base sink."""
    from ..sources.matview import create_matview, refresh_matview, _read_meta
    from ..sources.versioned import current_version

    def _merge(batch: DataFrame, _batch_id: int) -> None:
        latest = _merge_versioned_batch(batch, path, key=key, order=order)
        if latest is None:
            return
        spark = batch.sparkSession
        try:
            meta = _read_meta(view_path)
        except FileNotFoundError:
            create_matview(spark, path, view_path, group=group, value=value)
            return
        if meta["base_version"] == current_version(path) - 1:
            refresh_matview(
                spark, path, view_path, key=key, changed_keys=latest.select(key)
            )
        else:  # crashed between commit and refresh: full-diff catch-up
            refresh_matview(spark, path, view_path, key=key)

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_versioned_upsert(
    stream: DataFrame,
    path: str,
    key: str,
    order: str,
    checkpoint: str,
    available_now: bool = True,
):
    """The upsert sink against a VERSIONED table (sources/versioned.py):
    every micro-batch commits a new snapshot — last-wins collapse →
    footer-scoped copy-on-write merge → atomic pointer flip. Readers get
    snapshot isolation while the stream writes, time travel across
    micro-batches, and a CDC changefeed between any two commits; replay
    convergence follows from the same idempotent-merge argument as
    ``streaming_upsert`` (a replayed batch rewrites the same content
    into a new snapshot — table STATE converges even though a version
    number is consumed)."""
    def _merge(batch: DataFrame, _batch_id: int) -> None:
        _merge_versioned_batch(batch, path, key=key, order=order)

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_append_with_distinct_matview(
    stream: DataFrame,
    path: str,
    key: str,
    checkpoint: str,
    view_path: str,
    group: str,
    value: str,
    b: int = 8,
    available_now: bool = True,
):
    """Append-only versioned ingest + an APPROX-DISTINCT register view
    (sources/matview.create_distinct_matview) kept current per
    micro-batch — the streaming face of the Druid-style rollup: each
    batch commits a snapshot, then the view merges ONLY the new files'
    HLL registers (monotone state, so per-batch maintenance scans the
    batch, never the table).

    Each batch commits through ``append_version`` — the pure-append
    manifest extension that can NEVER rewrite a file — so non-monotone
    (but still new) keys, and even Bloom false positives, cannot trip
    ``refresh_distinct_matview``'s non-append-DML error: the sink's
    commit path structurally produces only appended files. The table is
    an append LOG: the producer owns key uniqueness (a replayed or
    duplicate key appends a duplicate ROW — the HLL registers are
    unaffected, sketching is idempotent on values, but keyed merge
    consumers should read through ``latest_per_key``). Crash between
    the table commit and the view refresh: the next batch's refresh
    merges the symmetric difference of BOTH commits (pure appends mean
    it is still exactly the appended files) — replay converges."""
    from ..sources.matview import (
        create_distinct_matview,
        refresh_distinct_matview,
    )
    from ..sources.versioned import append_version, write_version

    def _ingest(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        try:
            append_version(spark, path, batch, key=key)
        except FileNotFoundError:
            write_version(batch, path, key=key)
            create_distinct_matview(
                spark, path, view_path, group=group, value=value, b=b
            )
            return
        refresh_distinct_matview(spark, path, view_path)

    writer = stream.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
