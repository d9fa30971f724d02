"""Streaming corpus ingest: cross-batch (beyond-watermark) dedup via the
corpus-as-state anti-join, replay convergence, quality gating."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.streaming.ingest import streaming_ingest_dedup

GOOD = (
    "the quick brown fox jumps over the lazy dog and then naps in warm "
    "sunlight for several quiet hours during the slow golden afternoon"
)


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="stream_ingest_")
    p = {n: os.path.join(root, n) for n in ("in", "corpus", "ckpt", "ckpt2")}
    os.makedirs(p["in"])
    yield p
    shutil.rmtree(root, ignore_errors=True)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("append").parquet(path)


def _run(spark, dirs, ckpt="ckpt", **kw):
    schema = spark.read.parquet(dirs["in"]).schema
    stream = spark.readStream.schema(schema).parquet(dirs["in"])
    q = streaming_ingest_dedup(
        stream, dirs["corpus"], checkpoint=dirs[ckpt], **kw
    )
    q.awaitTermination(180)


def _corpus_ids(spark, dirs):
    return sorted(
        r.doc_id for r in spark.read.parquet(dirs["corpus"]).select("doc_id").collect()
    )


def test_ingest_dedups_within_and_across_batches(spark, dirs):
    _write_batch(spark, dirs["in"], [
        (1, GOOD), (2, GOOD), (3, GOOD + " extra ending one")
    ])
    _run(spark, dirs)
    assert _corpus_ids(spark, dirs) == [1, 3]  # 2 collapsed within batch

    # a second batch arriving LATER (beyond any watermark horizon)
    # re-delivers batch-1 content under new ids plus one new doc
    _write_batch(spark, dirs["in"], [
        (10, GOOD), (11, GOOD + " extra ending one"),
        (12, GOOD + " genuinely new ending"),
    ])
    _run(spark, dirs)
    assert _corpus_ids(spark, dirs) == [1, 3, 12]


def test_ingest_replay_converges(spark, dirs):
    _write_batch(spark, dirs["in"], [(1, GOOD), (2, GOOD + " tail two")])
    _run(spark, dirs)
    before = _corpus_ids(spark, dirs)
    _run(spark, dirs, ckpt="ckpt2")  # fresh checkpoint = full replay
    assert _corpus_ids(spark, dirs) == before  # append-nothing replay


def test_ingest_quality_gate(spark, dirs):
    _write_batch(spark, dirs["in"], [
        (1, GOOD), (2, ("spam spam " * 20).strip()), (3, "too short"),
    ])
    _run(spark, dirs, quality_gate=True)
    assert _corpus_ids(spark, dirs) == [1]


def test_ingest_normalized_fingerprint(spark, dirs):
    """Whitespace/case variants are the same document."""
    _write_batch(spark, dirs["in"], [(1, GOOD)])
    _run(spark, dirs)
    _write_batch(spark, dirs["in"], [(5, GOOD.upper().replace(" ", "  "))])
    _run(spark, dirs)
    assert _corpus_ids(spark, dirs) == [1]


def test_ingest_exact_duplicate_rows_collapse(spark, dirs):
    """Rows sharing BOTH id and fingerprint inside one micro-batch keep
    exactly one copy (ADVICE r4: the (min-id, fp) semi-join kept all)."""
    _write_batch(spark, dirs["in"], [(1, GOOD), (1, GOOD), (1, GOOD)])
    _run(spark, dirs)
    rows = spark.read.parquet(dirs["corpus"]).collect()
    assert len(rows) == 1 and rows[0].doc_id == 1


def test_curated_corpus_empty_when_all_rejected(spark, dirs):
    """A committed snapshot that holds ONLY rejected (_status=near_dup)
    files is an EMPTY corpus, not a missing table: read_curated_corpus
    must return zero rows in the table schema instead of raising
    (ADVICE r7: pollers regressed from empty-result to crash)."""
    import glob

    from financial_big_data_spark.sources.versioned import _commit
    from financial_big_data_spark.streaming.ingest import (
        _read_committed,
        read_curated_corpus,
    )

    table = dirs["corpus"]
    staging = os.path.join(table, "data", "batch-allrejected")
    spark.createDataFrame(
        [(1, GOOD, "near_dup")], "doc_id long, text string, _status string"
    ).coalesce(1).write.partitionBy("_status").parquet(staging)
    files = sorted(glob.glob(os.path.join(staging, "_status=*", "*.parquet")))
    assert files
    _commit(table, files, 1)

    out = read_curated_corpus(spark, table)
    assert out.count() == 0
    assert "doc_id" in out.columns and "text" in out.columns
    # the rejected rows are still readable under their own status
    nd = _read_committed(spark, table, status="near_dup")
    assert nd.count() == 1
    # a table with NO committed snapshot still raises
    with pytest.raises(FileNotFoundError, match="no committed snapshot"):
        read_curated_corpus(spark, os.path.join(dirs["in"], "nowhere"))
