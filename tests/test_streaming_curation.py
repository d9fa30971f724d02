"""Streaming curation gate: quality flags + watermarked dedup on a stream,
with exact batch parity on the accepted set."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.quality import quality_metric_columns
from financial_big_data_spark.streaming.curation import streaming_curation

GOOD = (
    "the quick brown fox jumps over the lazy dog and then naps in warm "
    "sunlight for several quiet hours during the slow golden afternoon today"
)


@pytest.fixture(scope="module")
def curation_stream_dir(spark):
    rows = [
        (0, GOOD, "2024-01-01 10:00:00"),
        (1, ("spam spam " * 20).strip(), "2024-01-01 10:01:00"),  # repetitive
        (2, "too short", "2024-01-01 10:02:00"),                  # short
        (3, GOOD, "2024-01-01 10:03:00"),                         # dup of 0
        (4, GOOD + " with a small extra tail sentence attached here", "2024-01-01 10:04:00"),
    ]
    df = (
        spark.createDataFrame(rows, "doc_id long, text string, ts_str string")
        .withColumn("ts", F.col("ts_str").cast("timestamp"))
        .drop("ts_str")
    )
    d = tempfile.mkdtemp(prefix="curation_stream_")
    df.coalesce(1).write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_streaming_curation_batch_parity(spark, curation_stream_dir):
    schema = spark.read.parquet(curation_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(curation_stream_dir)
    out = _run(spark, streaming_curation(stream), "curated_stream").collect()
    # batch reference: quality gate then first-per-fingerprint
    batch = spark.read.parquet(curation_stream_dir)
    cols = quality_metric_columns("text")
    passing = {
        r["doc_id"]
        for r in batch.select("doc_id", cols["pass_quality"].alias("p"))
        .where(F.col("p") == 1)
        .collect()
    }
    assert passing == {0, 3, 4}
    # dedup collapses 0/3 (same fingerprint) to the first arrival
    assert {r["doc_id"] for r in out} == {0, 4}


def test_streaming_curation_keep_metrics(spark, curation_stream_dir):
    schema = spark.read.parquet(curation_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(curation_stream_dir)
    out = _run(
        spark,
        streaming_curation(stream, keep_metrics=True),
        "curated_stream_metrics",
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0, 4}
    assert all(r["pass_quality"] == 1 for r in rows.values())
    assert rows[0]["n_tokens"] >= 17
