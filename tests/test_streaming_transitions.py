"""Streaming gaps-and-islands (W12) across micro-batch boundaries:
streaming_regime_transitions must byte-match the batch operator on the
concatenated input for any micro-batch split (VERDICT r7 #8)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
import time as _time

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.transitions import regime_transitions
from financial_big_data_spark.streaming.regime import streaming_regime_transitions

REGIMES = [
    # runs deliberately SPAN the 3 batch cuts (minutes 0-20-40-60): the
    # run open at each boundary must close correctly in a later batch
    "bull_calm", "bull_calm", "bull_volatile", "bull_volatile", "bear_calm",
]


@pytest.fixture(scope="module")
def labeled_stream(spark):
    rows = []
    for s, stride in (("AAA", 7), ("BBB", 11)):
        for i in range(60):
            rows.append(
                (
                    s,
                    dt.datetime(2024, 3, 1) + dt.timedelta(minutes=i),
                    REGIMES[(i // stride) % len(REGIMES)],
                )
            )
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, regime string")
    d = tempfile.mkdtemp(prefix="trans_stream_")
    for j, (lo, hi) in enumerate([(0, 20), (20, 40), (40, 60)]):
        df.where((F.minute("ts") >= lo) & (F.minute("ts") < hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/f{j}")
        _time.sleep(1.1)  # distinct mtimes -> in-order micro-batches
    yield df, d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_transitions_byte_match_batch(spark, labeled_stream):
    df, d = labeled_stream
    schema = spark.read.parquet(f"{d}/f0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
    )
    q = (
        streaming_regime_transitions(stream)
        .writeStream.format("memory")
        .queryName("trans_tws")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 3, "state carry-over untested with a single micro-batch"

    cols = (
        "symbol from_regime to_regime start_time end_time duration "
        "duration_days is_volatility_increase is_trend_change"
    ).split()
    got = sorted(tuple(r[c] for c in cols) for r in spark.table("trans_tws").collect())
    exp = sorted(
        tuple(r[c] for c in cols) for r in regime_transitions(df).collect()
    )
    # exact ==, not approx: durations must be byte-identical doubles
    assert got == exp
    assert len(got) >= 6
    # at least one run spans a batch boundary (starts before a cut, ends
    # at/after it) — the thing single-batch processing cannot produce
    cut = dt.datetime(2024, 3, 1, 0, 20)
    assert any(r[3] < cut <= r[4] for r in got)


def test_streaming_transitions_out_of_order_raises_named(spark):
    """VERDICT r8 #5: a batch-2 row older than the open run's end must
    fail loudly (naming the series), never silently extend a run it
    precedes."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    rows = [
        ("AAA", dt.datetime(2024, 3, 2) + dt.timedelta(minutes=i),
         REGIMES[(i // 7) % len(REGIMES)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, regime string")
    d = tempfile.mkdtemp(prefix="trans_ooo_")
    try:
        # batch 1 = minutes 20-39, batch 2 = minutes 0-19 (entirely late)
        for j, (lo, hi) in enumerate([(20, 40), (0, 20)]):
            df.where((F.minute("ts") >= lo) & (F.minute("ts") < hi)).coalesce(
                1
            ).write.mode("overwrite").parquet(f"{d}/f{j}")
            _time.sleep(1.1)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/f*")
        )
        q = (
            streaming_regime_transitions(stream)
            .writeStream.format("memory")
            .queryName("trans_ooo_err")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(StreamingQueryException, match="out-of-order"):
            q.awaitTermination(180)
        assert "AAA" in str(q.exception())
    finally:
        shutil.rmtree(d, ignore_errors=True)
