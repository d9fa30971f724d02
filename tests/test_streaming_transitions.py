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


def test_state_layout_guard_named_error():
    """VERDICT r9 #7 / ADVICE r9: a state row restored from a checkpoint
    written by a different build (wrong field count OR wrong layout tag)
    must raise the NAMED restart-from-fresh-checkpoint error, never a raw
    tuple-unpack ValueError deep in the worker."""
    from financial_big_data_spark.streaming.ordering import (
        STATE_VERSION,
        read_state,
    )

    class FakeState:
        def __init__(self, row):
            self._row = row

        @property
        def get(self):
            return self._row

    # pre-r9 layout: operator fields only (1-tuple)
    with pytest.raises(ValueError, match="fresh checkpoint"):
        read_state(FakeState((0.5,)), 3, "streaming_ewm_mean")
    # r9 layout: right op fields + last_ts but NO version tag
    with pytest.raises(ValueError, match="incompatible layout"):
        read_state(FakeState((0.5, dt.datetime(2024, 1, 1))), 3, "x")
    # same length but a stale tag value
    with pytest.raises(ValueError, match="incompatible layout"):
        read_state(FakeState((1, 0.5, None)), 3, "x")
    # current layout round-trips
    assert read_state(FakeState((STATE_VERSION, 0.5, None)), 3, "x") == (0.5, None)


@pytest.fixture(scope="module")
def disordered_labeled_stream(spark):
    """Bounded disorder: batch 1 = minutes 0-29 except 28; batch 2 leads
    with the 1-minute-late 28 then 30-59. A 90s reorder bound absorbs it."""
    rows = [
        ("AAA", dt.datetime(2024, 4, 1) + dt.timedelta(minutes=i),
         REGIMES[(i // 7) % len(REGIMES)])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, regime string")
    d = tempfile.mkdtemp(prefix="trans_buf_")
    b1 = (F.minute("ts") <= 29) & (F.minute("ts") != 28)
    b2 = (F.minute("ts") == 28) | (F.minute("ts") >= 30)
    for j, cond in enumerate([b1, b2]):
        df.where(cond).coalesce(1).write.mode("overwrite").parquet(f"{d}/f{j}")
        _time.sleep(1.1)
    yield df, d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_transitions_buffered_disordered_byte_match(
    spark, disordered_labeled_stream
):
    """VERDICT r9 #4: delay_seconds= on the W12 run tracker — a
    disordered-within-bound replay byte-matches the batch operator (the
    late minute-28 row folds back into event-time order; every
    transition-triggering row clears the final watermark, so the outputs
    are IDENTICAL, not a prefix)."""
    df, d = disordered_labeled_stream
    schema = spark.read.parquet(f"{d}/f0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{d}/f*")
    )
    q = (
        streaming_regime_transitions(stream, delay_seconds=90)
        .writeStream.format("memory")
        .queryName("trans_buf")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    cols = (
        "symbol from_regime to_regime start_time end_time duration "
        "duration_days is_volatility_increase is_trend_change"
    ).split()
    got = sorted(
        tuple(r[c] for c in cols) for r in spark.table("trans_buf").collect()
    )
    exp = sorted(
        tuple(r[c] for c in cols) for r in regime_transitions(df).collect()
    )
    # 4 completed runs (consecutive REGIMES entries repeat, merging
    # adjacent 7-minute blocks); the 5th run stays open and drops, same
    # as batch
    assert got == exp and len(got) == 4
    # the late minute-28 row OPENS the bear_calm run — its start time is
    # exactly the absorbed row, proving it folded back in order
    assert any(r[3] == dt.datetime(2024, 4, 1, 0, 28) for r in got)


def test_streaming_transitions_buffered_beyond_bound_raises(spark):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    rows = [
        ("AAA", dt.datetime(2024, 4, 2) + dt.timedelta(minutes=i),
         REGIMES[(i // 7) % len(REGIMES)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, regime string")
    d = tempfile.mkdtemp(prefix="trans_buf_err_")
    try:
        # batch 2 leads with minute 5 — 15 min behind batch 1's max of 20,
        # far beyond the 60s bound (minute 5 predates absorbed rows)
        b1 = (F.minute("ts") >= 6) & (F.minute("ts") <= 20)
        b2 = (F.minute("ts") <= 5) | (F.minute("ts") > 20)
        for j, cond in enumerate([b1, b2]):
            df.where(cond).coalesce(1).write.mode("overwrite").parquet(f"{d}/f{j}")
            _time.sleep(1.1)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/f*")
        )
        q = (
            streaming_regime_transitions(stream, delay_seconds=60)
            .writeStream.format("memory")
            .queryName("trans_buf_err")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        with pytest.raises(StreamingQueryException, match="beyond the reorder bound"):
            q.awaitTermination(180)
        assert "AAA" in str(q.exception())
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_label_to_transitions_buffered_end_to_end(spark):
    """VERDICT r9 #4 done-bar: a disordered-within-bound bar replay,
    buffered at the LABELING entry, byte-matches the batch pipeline end
    to end THROUGH transitions: buffered labels == batch labels on the
    emitted prefix, and the (in-order) label stream through the run
    tracker == batch regime_transitions on that prefix."""
    from financial_big_data_spark.operators.regime import (
        detect_regime_5way,
        regime_features,
    )
    from financial_big_data_spark.streaming.regime import (
        streaming_label_transitions,
    )

    rows = [
        ("AAA", dt.datetime(2024, 4, 3) + dt.timedelta(minutes=i),
         100.0 + ((i * 37) % 13) - (i % 5) * 2.1)
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    d = tempfile.mkdtemp(prefix="label_buf_e2e_")
    try:
        # timestamp-literal cuts, NOT minute() — the 90-row series crosses
        # the hour, so minute() wraps and would scramble the batches
        t0 = dt.datetime(2024, 4, 3)
        late = t0 + dt.timedelta(minutes=43)
        cut = t0 + dt.timedelta(minutes=45)
        b1 = (F.col("ts") < F.lit(cut)) & (F.col("ts") != F.lit(late))
        b2 = (F.col("ts") == F.lit(late)) | (F.col("ts") >= F.lit(cut))
        for j, cond in enumerate([b1, b2]):
            df.where(cond).coalesce(1).write.mode("overwrite").parquet(f"{d}/f{j}")
            _time.sleep(1.1)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/f*")
        )
        q = (
            streaming_label_transitions(
                stream, series="symbol", time="ts", close="close",
                window_size=8, delay_seconds=90,
            )
            .writeStream.format("memory")
            .queryName("labels_buf")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None
        got_labels = spark.table("labels_buf")
        # final watermark = minute 89 - 1.5 => labels emitted through 87
        wm = dt.datetime(2024, 4, 3, 1, 27, 30)
        batch_labels = detect_regime_5way(
            regime_features(
                df.withColumn("volume", F.col("close")),
                series="symbol", time="ts", close="close", volume="volume",
                window_size=8,
            )
        )
        exp_map = {
            r.ts: r.regime
            for r in batch_labels.where(F.col("ts") <= F.lit(wm)).collect()
        }
        got_map = {r.ts: r.regime for r in got_labels.collect()}
        assert got_map == exp_map and len(got_map) >= 85
        # ...and THROUGH transitions: buffered-label output is in order,
        # so the run tracker consumes it under its enforced contract
        trans = sorted(
            (r.from_regime, r.to_regime, r.start_time, r.end_time, r.duration)
            for r in regime_transitions(
                got_labels.select("symbol", "ts", "regime")
            ).collect()
        )
        exp_trans = sorted(
            (r.from_regime, r.to_regime, r.start_time, r.end_time, r.duration)
            for r in regime_transitions(
                batch_labels.where(F.col("ts") <= F.lit(wm)).select(
                    "symbol", "ts", "regime"
                )
            ).collect()
        )
        assert trans == exp_trans
    finally:
        shutil.rmtree(d, ignore_errors=True)
