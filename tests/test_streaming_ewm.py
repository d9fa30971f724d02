"""Streaming EWM/MACD: byte-exact continuation of the batch recurrence
across micro-batches (the chunked carry-over path functions/ewm.py declares
out of scope for batch)."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile
import time as _time

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.functions.ewm import ewm_mean as batch_ewm
from financial_big_data_spark.functions.ewm import macd as batch_macd
from financial_big_data_spark.streaming.ewm import streaming_ewm_mean, streaming_macd


@pytest.fixture(scope="module")
def ewm_stream(spark):
    rows = []
    for s in ("AAA", "BBB"):
        for i in range(60):
            rows.append(
                (
                    s,
                    dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
                    100.0 + ((i * 37) % 13) - (i % 5) * 0.7,
                )
            )
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    d = tempfile.mkdtemp(prefix="ewm_stream_")
    # Three files with strictly increasing mtimes → three micro-batches in
    # event-time order under maxFilesPerTrigger=1 (FileStreamSource orders
    # by modification time; sub-second ties would break the in-order
    # contract, hence the sleeps).
    for j, (lo, hi) in enumerate([(0, 20), (20, 40), (40, 60)]):
        df.where((F.minute("ts") >= lo) & (F.minute("ts") < hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/f{j}")
        _time.sleep(1.1)
    yield df, d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, d, build, name):
    schema = spark.read.parquet(f"{d}/f0").schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(f"{d}/f*")
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    return spark.table(name), n_batches


def test_streaming_ewm_mean_bit_exact_across_batches(spark, ewm_stream):
    df, d = ewm_stream
    got_df, n_batches = _run(
        spark, d, lambda s: streaming_ewm_mean(s, value="close", span=10), "ewm_tws"
    )
    assert n_batches >= 3, "state carry-over untested with a single micro-batch"
    got = {(r.symbol, r.ts): r.ewm for r in got_df.collect()}
    exp = {
        (r.symbol, r.ts): r.ewm
        for r in batch_ewm(df, value="close", span=10).collect()
    }
    assert len(got) == len(exp) == 120
    # exact ==, not approx: the continuation must be byte-identical
    mism = [k for k in exp if got[k] != exp[k]]
    assert not mism, mism[:5]


def test_streaming_macd_bit_exact_across_batches(spark, ewm_stream):
    df, d = ewm_stream
    got_df, n_batches = _run(spark, d, streaming_macd, "macd_tws")
    assert n_batches >= 3
    got = {
        (r.symbol, r.ts): (r.macd, r.macd_signal, r.macd_hist)
        for r in got_df.collect()
    }
    exp = {
        (r.symbol, r.ts): (r.macd, r.macd_signal, r.macd_hist)
        for r in batch_macd(df).collect()
    }
    assert len(got) == len(exp) == 120
    mism = [k for k in exp if got[k] != exp[k]]
    assert not mism, mism[:5]


def test_continue_ewm_span_not_alpha():
    """pandas derives the decay weight differently for span= and alpha= —
    equal as reals, one ulp apart as doubles, diverging the recurrence
    within a few steps. The continuation must use span=."""
    import pandas as pd

    s = pd.Series([100.0 + ((i * 37) % 13) for i in range(20)])
    a = s.ewm(span=10, adjust=False).mean()
    b = s.ewm(alpha=2.0 / 11.0, adjust=False).mean()
    assert (a.to_numpy() != b.to_numpy()).any()  # the trap is real

    from financial_big_data_spark.streaming.ewm import _continue_ewm

    out, prev = [], None
    for chunk in (s[:7], s[7:13], s[13:]):
        y = _continue_ewm(chunk, 10, prev)
        out.append(y)
        prev = float(y.iloc[-1])
    got = pd.concat(out, ignore_index=True)
    assert (got.to_numpy() == a.to_numpy()).all()


def test_streaming_ewm_multi_chunk_group(spark, ewm_stream):
    """A group bigger than arrow maxRecordsPerBatch arrives as MULTIPLE
    unordered chunks — the processor must concat + sort the whole batch
    before continuing the recurrence (regression: per-chunk sorting with
    cross-chunk carry diverged from batch)."""
    df, d = ewm_stream
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got_df, _ = _run(
            spark,
            d,
            lambda s: streaming_ewm_mean(s, value="close", span=10),
            "ewm_chunked",
        )
        got = {(r.symbol, r.ts): r.ewm for r in got_df.collect()}
        exp = {
            (r.symbol, r.ts): r.ewm
            for r in batch_ewm(df, value="close", span=10).collect()
        }
        assert len(got) == 120
        mism = [k for k in exp if got[k] != exp[k]]
        assert not mism, mism[:5]
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


@pytest.fixture(scope="module")
def ooo_stream(spark):
    """Two micro-batches that VIOLATE the cross-batch order: batch 1 holds
    the even minutes 0..58, batch 2 the odd minutes 1..59 — every batch-2
    row except :59 is older than batch 1's last processed event."""
    rows = [
        ("AAA", dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i),
         100.0 + ((i * 37) % 13) - (i % 5) * 0.7)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    d = tempfile.mkdtemp(prefix="ewm_ooo_")
    for j, cond in enumerate([F.minute("ts") % 2 == 0, F.minute("ts") % 2 == 1]):
        df.where(cond).coalesce(1).write.mode("overwrite").parquet(f"{d}/f{j}")
        _time.sleep(1.1)
    yield df, d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_ewm_out_of_order_raises_named(spark, ooo_stream):
    """VERDICT r8 #5: a late row must fail the batch LOUDLY, naming the
    series and timestamps — never silently corrupt the recurrence."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    df, d = ooo_stream
    schema = df.schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(f"{d}/f*")
    )
    q = (
        streaming_ewm_mean(stream, value="close", span=10)
        .writeStream.format("memory")
        .queryName("ewm_ooo_err")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="out-of-order"):
        q.awaitTermination(180)
    assert "AAA" in str(q.exception())


def test_streaming_ewm_out_of_order_drop_processes_in_order_subset(spark, ooo_stream):
    """on_late='drop': late rows are discarded and the survivors continue
    the recurrence byte-identically to the batch operator on the kept
    (in-order) subset."""
    df, d = ooo_stream
    schema = df.schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(f"{d}/f*")
    )
    q = (
        streaming_ewm_mean(stream, value="close", span=10, on_late="drop")
        .writeStream.format("memory")
        .queryName("ewm_ooo_drop")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {(r.symbol, r.ts): r.ewm for r in spark.table("ewm_ooo_drop").collect()}
    # kept subset: all even minutes (batch 1) + :59 (the only odd row not
    # older than batch 1's last processed :58)
    kept = df.where((F.minute("ts") % 2 == 0) | (F.minute("ts") == 59))
    exp = {
        (r.symbol, r.ts): r.ewm
        for r in batch_ewm(kept, value="close", span=10).collect()
    }
    assert got == exp and len(got) == 31


def test_on_late_validated_eagerly(spark, ooo_stream):
    df, _ = ooo_stream
    with pytest.raises(ValueError, match="on_late"):
        streaming_ewm_mean(df, value="close", span=10, on_late="ignore")


@pytest.fixture(scope="module")
def buffered_stream(spark):
    """Bounded disorder: batch 1 = minutes 0-24 and 26-29; batch 2 leads
    with the late minute 25 (4 min behind batch 1's max) then 30-59."""
    rows = [
        ("AAA", dt.datetime(2024, 2, 1) + dt.timedelta(minutes=i),
         100.0 + ((i * 37) % 13) - (i % 5) * 0.7)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "symbol string, ts timestamp, close double")
    d = tempfile.mkdtemp(prefix="ewm_buf_")
    b1 = (F.minute("ts") <= 24) | ((F.minute("ts") >= 26) & (F.minute("ts") <= 29))
    b2 = (F.minute("ts") == 25) | (F.minute("ts") >= 30)
    for j, cond in enumerate([b1, b2]):
        df.where(cond).coalesce(1).write.mode("overwrite").parquet(f"{d}/f{j}")
        _time.sleep(1.1)
    yield df, d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_ewm_buffered_absorbs_bounded_disorder(spark, buffered_stream):
    """The reorder-buffer variant: a 10-minute watermark absorbs the
    4-minute-late row; emitted rows are byte-identical to the batch
    operator on the SORTED full input (prefix up to the final
    watermark); the last delay's worth of rows stays buffered."""
    from financial_big_data_spark.streaming.ewm import streaming_ewm_mean_buffered

    df, d = buffered_stream
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(f"{d}/f*")
    )
    q = (
        streaming_ewm_mean_buffered(
            stream, value="close", span=10, delay_seconds=600
        )
        .writeStream.format("memory")
        .queryName("ewm_buf")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert q.exception() is None
    got = {(r.symbol, r.ts): r.ewm for r in spark.table("ewm_buf").collect()}
    # final watermark = minute 59 - 10 => rows up to minute 49 emitted,
    # INCLUDING the late minute 25 folded back into event-time order
    exp = {
        (r.symbol, r.ts): r.ewm
        for r in batch_ewm(df, value="close", span=10)
        .where(F.minute("ts") <= 49)
        .collect()
    }
    assert len(got) == 50 and got == exp


def test_streaming_ewm_buffered_beyond_bound_raises(spark, buffered_stream):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from financial_big_data_spark.streaming.ewm import streaming_ewm_mean_buffered

    df, d = buffered_stream
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(f"{d}/f*")
    )
    # 60s bound: after batch 1 the watermark sits at minute 28, so the
    # 4-minute-late minute 25 in batch 2 is older than the last EMITTED
    # event — beyond the bound, must fail naming the series
    q = (
        streaming_ewm_mean_buffered(
            stream, value="close", span=10, delay_seconds=60
        )
        .writeStream.format("memory")
        .queryName("ewm_buf_err")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="beyond the reorder bound"):
        q.awaitTermination(180)
    assert "AAA" in str(q.exception())


def test_streaming_ewm_buffered_carries_input_columns(spark):
    """VERDICT r9 #4: the buffered EWM's output schema is the INPUT
    schema + ewm — extra columns ride the reorder buffer instead of
    being projected away (no re-join on (series, ts) needed)."""
    from financial_big_data_spark.streaming.ewm import streaming_ewm_mean_buffered

    rows = [
        ("AAA", dt.datetime(2024, 5, 1) + dt.timedelta(minutes=i),
         100.0 + i * 0.5, i * 10, f"tag{i}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, close double, volume long, tag string"
    )
    d = tempfile.mkdtemp(prefix="ewm_buf_carry_")
    try:
        b1 = (F.minute("ts") <= 14) & (F.minute("ts") != 13)
        b2 = (F.minute("ts") == 13) | (F.minute("ts") >= 15)
        for j, cond in enumerate([b1, b2]):
            df.where(cond).coalesce(1).write.mode("overwrite").parquet(f"{d}/f{j}")
            _time.sleep(1.1)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/f*")
        )
        out = streaming_ewm_mean_buffered(
            stream, value="close", span=5, delay_seconds=120
        )
        assert out.columns == ["symbol", "ts", "close", "volume", "tag", "ewm"]
        q = (
            out.writeStream.format("memory")
            .queryName("ewm_carry")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None
        got = {r.ts: (r.volume, r.tag, r.ewm) for r in spark.table("ewm_carry").collect()}
        # watermark = minute 29 - 2 => rows through minute 27 emitted,
        # the late minute 13 included, extra columns intact
        exp_ewm = {
            r.ts: r.ewm
            for r in batch_ewm(df, value="close", span=5)
            .where(F.minute("ts") <= 27)
            .collect()
        }
        assert set(got) == set(exp_ewm) and len(got) == 28
        for i in range(28):
            ts = dt.datetime(2024, 5, 1) + dt.timedelta(minutes=i)
            vol, tag, ewm = got[ts]
            assert (vol, tag) == (i * 10, f"tag{i}")
            assert ewm == exp_ewm[ts]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_drop_replayed_discards_equal_timestamp_redelivery():
    """ADVICE r9: on_late='drop' keeps rows with event time EQUAL to the
    last processed (an at-least-once redelivery re-folds into the
    recurrence); on_late='drop-replayed' drops at-or-before rows, so the
    redelivered last row is discarded."""
    import pandas as pd

    from financial_big_data_spark.streaming.ordering import enforce_series_order

    t = [dt.datetime(2024, 6, 1, 0, m) for m in range(4)]
    pdf = pd.DataFrame({"ts": [t[2], t[3]], "v": [1.0, 2.0]})
    kept_drop = enforce_series_order(pdf, "ts", t[2], "AAA", "drop")
    assert kept_drop["ts"].tolist() == [t[2], t[3]]  # equal ts reprocessed
    kept_replayed = enforce_series_order(pdf, "ts", t[2], "AAA", "drop-replayed")
    assert kept_replayed["ts"].tolist() == [t[3]]  # redelivery discarded
    # strictly-late rows drop under both
    pdf2 = pd.DataFrame({"ts": [t[0], t[3]], "v": [1.0, 2.0]})
    assert enforce_series_order(pdf2, "ts", t[2], "A", "drop")["ts"].tolist() == [t[3]]


def test_streaming_macd_buffered_absorbs_disorder_and_carries_columns(spark):
    """delay_seconds= on MACD (the last O(1)-state op without a buffered
    variant): a disordered-within-bound replay byte-matches the batch
    MACD on the emitted watermark prefix, with input columns carried."""
    from financial_big_data_spark.streaming.ewm import streaming_macd

    rows = [
        ("AAA", dt.datetime(2024, 5, 2) + dt.timedelta(minutes=i),
         100.0 + ((i * 37) % 13) - (i % 5) * 0.7, i)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, ts timestamp, close double, seq long"
    )
    d = tempfile.mkdtemp(prefix="macd_buf_")
    try:
        b1 = (F.minute("ts") <= 19) & (F.minute("ts") != 18)
        b2 = (F.minute("ts") == 18) | (F.minute("ts") >= 20)
        for j, cond in enumerate([b1, b2]):
            df.where(cond).coalesce(1).write.mode("overwrite").parquet(f"{d}/f{j}")
            _time.sleep(1.1)
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/f*")
        )
        out = streaming_macd(stream, close="close", delay_seconds=120)
        assert out.columns == [
            "symbol", "ts", "close", "seq", "macd", "macd_signal", "macd_hist"
        ]
        q = (
            out.writeStream.format("memory")
            .queryName("macd_buf")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        assert q.exception() is None
        got = {
            r.ts: (r.seq, r.macd, r.macd_signal, r.macd_hist)
            for r in spark.table("macd_buf").collect()
        }
        # watermark = minute 39 - 2 => rows through minute 37 emitted
        exp = {
            r.ts: (r.macd, r.macd_signal, r.macd_hist)
            for r in batch_macd(df, close="close")
            .where(F.minute("ts") <= 37)
            .collect()
        }
        assert set(got) == set(exp) and len(got) == 38
        for ts, (seq, m, s, h) in got.items():
            assert (m, s, h) == exp[ts]  # byte-exact doubles
            assert seq == ts.minute  # carried column intact
    finally:
        shutil.rmtree(d, ignore_errors=True)
