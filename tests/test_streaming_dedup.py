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


def test_streaming_dedup_state_survives_restart(spark, tmp_path):
    """Checkpointed dedup state must carry across query restarts: a
    duplicate arriving in a LATER run of the same query (same checkpoint)
    is still suppressed — the exactly-once recovery contract."""
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")
    src.mkdir()
    schema = "doc_id long, text string, ts timestamp"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        q = (
            streaming_exact_dedup(stream, watermark="2 hours")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    import datetime as dt

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)
    write_batch("b1", [(1, "payload one", t0), (2, "payload two", t0)])
    run_once()
    # second run, same checkpoint: re-delivery of payload one + a new doc
    write_batch(
        "b2",
        [
            (3, "payload one", t0 + dt.timedelta(minutes=30)),
            (4, "payload three", t0 + dt.timedelta(minutes=30)),
        ],
    )
    run_once()
    out = spark.read.parquet(sink)
    texts = sorted(r.text for r in out.collect())
    assert texts == ["payload one", "payload three", "payload two"]
