"""Streaming dedup + stream-static enrichment tests."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.streaming.dedup import (
    enrich_with_dimension,
    streaming_exact_dedup,
)


@pytest.fixture(scope="module")
def doc_stream_dir(spark):
    rows = []
    # 30 docs, every third a duplicate of doc 0, timestamps inside one hour
    for i in range(30):
        text = "the same payload" if i % 3 == 0 else f"unique payload number {i}"
        rows.append((i, text, f"2024-01-01 10:{i:02d}:00"))
    df = spark.createDataFrame(rows, "doc_id long, text string, ts_str string").withColumn(
        "ts", F.col("ts_str").cast("timestamp")
    ).drop("ts_str")
    d = tempfile.mkdtemp(prefix="docs_stream_")
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


def test_streaming_exact_dedup(spark, doc_stream_dir):
    schema = spark.read.parquet(doc_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(doc_stream_dir)
    out = _run(spark, streaming_exact_dedup(stream), "dedup_stream")
    rows = out.collect()
    # 10 duplicates of the same payload collapse to one survivor
    assert len(rows) == 21
    same = [r for r in rows if r.text == "the same payload"]
    assert len(same) == 1


def test_stream_static_enrichment(spark, doc_stream_dir):
    schema = spark.read.parquet(doc_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(doc_stream_dir)
    dim = spark.createDataFrame(
        [(i, f"cat{i % 4}") for i in range(30)], "doc_id long, category string"
    )
    out = _run(spark, enrich_with_dimension(stream, dim, on="doc_id"), "enriched_stream")
    rows = out.collect()
    assert len(rows) == 30
    assert all(r.category is not None for r in rows)
