"""Streaming near-dup ingest gate: batch-pipeline parity (the stream's
accepted set == curate_corpus's survivors on the same documents fed in
id order), replay convergence, and the rejected-docs-still-veto rule."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.streaming.ingest import (
    read_curated_corpus,
    streaming_ingest_curated,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and naps in warm "
    "sunlight for several quiet hours during the slow golden afternoon "
    "while birds sing softly in the distant trees beyond the meadow"
)


def _variant(k: int) -> str:
    # high-overlap variants: same long body, one differing tail token
    return BASE + f" variant token {k}"


def _distinct_doc(k: int) -> str:
    words = [f"w{k}x{i}" for i in range(40)]
    return " ".join(words)


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="stream_neardup_")
    p = {n: os.path.join(root, n) for n in ("in", "table", "ckpt", "ckpt2")}
    os.makedirs(p["in"])
    yield p
    shutil.rmtree(root, ignore_errors=True)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.coalesce(1).write.mode("append").parquet(path)


def _run(spark, dirs, ckpt="ckpt", **kw):
    schema = spark.read.parquet(dirs["in"]).schema
    stream = spark.readStream.schema(schema).parquet(dirs["in"])
    q = streaming_ingest_curated(
        stream, dirs["table"], checkpoint=dirs[ckpt], **kw
    )
    q.awaitTermination(180)


def _accepted_ids(spark, dirs):
    return sorted(
        r.doc_id
        for r in read_curated_corpus(spark, dirs["table"]).select("doc_id").collect()
    )


DOCS = [
    (1, _variant(1)),            # near-dup cluster head
    (2, _variant(2)),            # near-dup of 1 -> dropped
    (3, _distinct_doc(3)),       # unique
    (4, _variant(1)),            # exact duplicate of 1 -> dropped (exact stage)
    (5, _distinct_doc(5)),       # unique
    (6, _variant(3)),            # near-dup of 1/2 -> dropped
    (7, _distinct_doc(7)),       # unique
]


def _batch_survivors(spark):
    from financial_big_data_spark.plans.corpus_curation import curate_corpus

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    res = curate_corpus(docs, min_tokens=1, near_dup_jaccard=0.5)
    ids = sorted(r.doc_id for r in res.corpus.select("doc_id").collect())
    from financial_big_data_spark.cache import release_tracked

    release_tracked()
    return ids


def test_stream_matches_batch_curation(spark, dirs):
    """Same docs, id-ordered across three micro-batches == one batch
    curate_corpus run."""
    want = _batch_survivors(spark)
    _write_batch(spark, dirs["in"], DOCS[:3])
    _run(spark, dirs)
    _write_batch(spark, dirs["in"], DOCS[3:5])
    _run(spark, dirs)
    _write_batch(spark, dirs["in"], DOCS[5:])
    _run(spark, dirs)
    assert _accepted_ids(spark, dirs) == want


def test_rejected_doc_still_vetoes(spark, dirs):
    """curate_corpus drops the higher id of EVERY verified pair, even
    when the lower id was itself dropped — the stream must keep rejected
    docs as dedup state so chains behave identically."""
    # 2 is a near-dup of 1 (rejected); 6 is a near-dup of 2
    _write_batch(spark, dirs["in"], [(1, _variant(1))])
    _run(spark, dirs)
    _write_batch(spark, dirs["in"], [(2, _variant(2))])
    _run(spark, dirs)
    _write_batch(spark, dirs["in"], [(6, _variant(2) + " tail")])
    _run(spark, dirs)
    assert _accepted_ids(spark, dirs) == [1]


def test_replay_converges(spark, dirs):
    _write_batch(spark, dirs["in"], DOCS[:5])
    _run(spark, dirs)
    before = _accepted_ids(spark, dirs)
    _run(spark, dirs, ckpt="ckpt2")  # fresh checkpoint = full replay
    assert _accepted_ids(spark, dirs) == before
    # the audit partition also didn't double
    n_rows = spark.read.parquet(dirs["table"]).count()
    _run(spark, dirs, ckpt="ckpt2")
    assert spark.read.parquet(dirs["table"]).count() == n_rows


def test_exact_dup_lands_nowhere_but_state_holds(spark, dirs):
    """An exact duplicate is dropped at the fingerprint stage (never
    reaches the near-dup join) and the rejected partition records only
    near-dups."""
    _write_batch(spark, dirs["in"], [(1, _variant(1)), (2, _variant(1))])
    _run(spark, dirs)
    tbl = spark.read.parquet(dirs["table"])
    assert _accepted_ids(spark, dirs) == [1]
    assert tbl.where(F.col("_status") == "near_dup").count() == 0


def test_quality_gate_composes(spark, dirs):
    _write_batch(spark, dirs["in"], [(1, BASE), (2, "too short")])
    _run(spark, dirs, quality_gate=True)
    assert _accepted_ids(spark, dirs) == [1]
