"""Streaming sessionization + stream-stream join: batch-parity tests."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import Window, functions as F

from financial_big_data_spark.streaming.sessions import (
    stream_stream_join,
    streaming_sessions,
)


@pytest.fixture(scope="module")
def event_stream_dir(spark):
    rows = []
    # user 1: three bursts separated by >2h gaps; user 2: one long session
    for uid, hours in [
        (1, [0.0, 0.5, 1.0, 4.0, 4.2, 9.0]),
        (2, [0.0, 1.5, 3.0, 4.5]),
    ]:
        for i, h in enumerate(hours):
            ts = f"2024-03-01 {int(h):02d}:{int(h % 1 * 60):02d}:00"
            rows.append((uid, i, ts, 10.0 + i, "view" if i % 2 else "purchase"))
    df = (
        spark.createDataFrame(
            rows, "user_id long, event_id long, ts_str string, value double, event_type string"
        )
        .withColumn("ts", F.col("ts_str").cast("timestamp"))
        .drop("ts_str")
    )
    d = tempfile.mkdtemp(prefix="ev_stream_")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, stream_df, name, mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_sessions_match_batch_islands(spark, event_stream_dir):
    """session_window(gap) must reproduce the batch gaps-and-islands
    sessionization: same session starts, counts and value sums, and
    session_end = last event + gap."""
    static = spark.read.parquet(event_stream_dir)
    stream = spark.readStream.schema(static.schema).parquet(event_stream_dir)
    # complete mode: emit every session regardless of watermark progress —
    # append mode would hold sessions newer than (max event time − watermark)
    # in state until later micro-batches close them, which a single
    # availableNow batch never does
    got = _run(
        spark,
        streaming_sessions(stream, gap="2 hours", watermark="4 hours"),
        "sessions_q",
        mode="complete",
    )
    rows = {
        (r.user_id, r.session_start): (r.n_events, r.total_value, r.session_end)
        for r in got.collect()
    }

    # batch islands (the q_ev_sessions machinery)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.timestamp_diff("MICROSECOND", F.lag("ts").over(w), F.col("ts"))
    new_s = F.when(gap_us.isNull() | (gap_us > 2 * 3600 * 1_000_000), 1).otherwise(0)
    islands = (
        static.withColumn(
            "_s", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "_s")
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("last"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,9)")), 6)
            .cast("double")
            .alias("total"),
        )
    )
    expected = {
        (r.user_id, r.start): (r.n, r.total, r.last) for r in islands.collect()
    }
    assert set(rows) == set(expected)
    for k, (n, total, end) in rows.items():
        en, etotal, elast = expected[k]
        assert n == en and total == etotal
        # session_window end extends gap past the last event
        assert (end - elast).total_seconds() == 2 * 3600
    # the fixture has 4 sessions: 3 for user 1, 1 for user 2
    assert len(rows) == 4


def test_stream_stream_join_matches_batch(spark, event_stream_dir):
    """Watermarked stream-stream range join == the same join run in batch."""
    static = spark.read.parquet(event_stream_dir)
    purchases_s = (
        spark.readStream.schema(static.schema).parquet(event_stream_dir)
        .where("event_type = 'purchase'")
    )
    views_s = (
        spark.readStream.schema(static.schema).parquet(event_stream_dir)
        .where("event_type = 'view'")
        .select(
            F.col("user_id"), F.col("ts").alias("view_ts"), F.col("value").alias("view_value")
        )
    )
    joined = stream_stream_join(
        purchases_s, views_s, key="user_id", left_time="ts", right_time="view_ts",
        horizon="1 hour", watermark="2 hours",
    ).select("l.user_id", "l.event_id", "view_ts", "view_value")
    got = {tuple(r) for r in _run(spark, joined, "ssj_q").collect()}

    pb = static.where("event_type = 'purchase'").alias("l")
    vb = (
        static.where("event_type = 'view'")
        .select("user_id", F.col("ts").alias("view_ts"), F.col("value").alias("view_value"))
        .alias("r")
    )
    cond = (
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("view_ts") <= F.col("l.ts"))
        & (F.col("view_ts") >= F.col("l.ts") - F.expr("INTERVAL 1 hour"))
    )
    expected = {
        tuple(r)
        for r in pb.join(vb, cond, "inner")
        .select("l.user_id", "l.event_id", "view_ts", "view_value")
        .collect()
    }
    assert got == expected and len(got) > 0
