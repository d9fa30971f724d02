"""Streaming windowed HLL: batch parity of the registers and a
bounded-state estimate check."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.sketches import hll_estimate, hll_sketch
from financial_big_data_spark.streaming.sketches import streaming_hll_registers


@pytest.fixture(scope="module")
def sketch_stream_dir(spark):
    rows = [
        (i, f"u{i % 37}", f"2024-01-01 {10 + (i // 40) % 3}:{i % 40:02d}:00")
        for i in range(120)
    ]
    df = (
        spark.createDataFrame(rows, "event_id long, user string, ts_str string")
        .withColumn("ts", F.col("ts_str").cast("timestamp"))
        .drop("ts_str")
    )
    d = tempfile.mkdtemp(prefix="sketch_stream_")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_hll_registers_batch_parity(spark, sketch_stream_dir):
    schema = spark.read.parquet(sketch_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(sketch_stream_dir)
    out = _run(
        spark,
        streaming_hll_registers(stream, "user", window="1 hour", b=6),
        "stream_hll",
    )
    # collapse multi-batch updates to the final (max) register per key
    got = {
        (str(r.window_start), r.bucket): r.rho
        for r in out.groupBy("window_start", "bucket")
        .agg(F.max("rho").alias("rho"))
        .collect()
    }
    batch = spark.read.parquet(sketch_stream_dir)
    for hour in (10, 11, 12):
        part = batch.where(F.hour("ts") == hour)
        want = {
            r.bucket: r.rho for r in hll_sketch(part, "user", b=6).collect()
        }
        for bucket, rho in want.items():
            key = (f"2024-01-01 {hour}:00:00", bucket)
            assert got[key] == rho, (hour, bucket)


def test_streaming_hll_estimate_close_to_exact(spark, sketch_stream_dir):
    schema = spark.read.parquet(sketch_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(sketch_stream_dir)
    regs = _run(
        spark,
        streaming_hll_registers(stream, "user", window="1 hour", b=6),
        "stream_hll_est",
    ).groupBy("window_start", "bucket").agg(F.max("rho").alias("rho"))
    est = {
        str(r.window_start): r.est_distinct
        for r in hll_estimate(regs, b=6, by=["window_start"]).collect()
    }
    # 37 distinct users per window; b=6 linear-counting regime is tight
    for v in est.values():
        assert abs(v - 37) / 37 < 0.25


def test_streaming_hll_validates_b(spark, sketch_stream_dir):
    schema = spark.read.parquet(sketch_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(sketch_stream_dir)
    with pytest.raises(ValueError):
        streaming_hll_registers(stream, "user", b=2)
