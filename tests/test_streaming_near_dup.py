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
    p = {n: os.path.join(root, n) for n in ("in", "table", "ckpt", "ckpt2", "ckpt3")}
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


def test_crash_before_manifest_claim_invisible_and_replay_converges(spark, dirs):
    """VERDICT r6 #3, crash window A: the writer dies AFTER the batch's
    data files land but BEFORE the manifest claim. The half-written batch
    must be invisible to every reader (it is referenced by no manifest)
    and a fresh-checkpoint replay must converge to the clean result."""
    import glob

    import financial_big_data_spark.sources.versioned as V
    from financial_big_data_spark.streaming.ingest import (
        _committed_files,
        _read_committed,
    )

    _write_batch(spark, dirs["in"], DOCS[:3])
    _run(spark, dirs)
    committed = list(_committed_files(spark_table := dirs["table"]))
    accepted_before = _accepted_ids(spark, dirs)

    _write_batch(spark, dirs["in"], DOCS[3:5])
    orig = V._commit

    def boom(*a, **k):
        raise RuntimeError("crash before manifest claim")

    V._commit = boom
    try:
        with pytest.raises(Exception, match="crash before manifest claim"):
            _run(spark, dirs)
    finally:
        V._commit = orig

    # nothing new is committed; readers see exactly the old snapshot
    assert _committed_files(spark_table) == committed
    assert _accepted_ids(spark, dirs) == accepted_before
    # ... while the dead batch's files DO sit on disk, unreferenced
    on_disk = set(
        glob.glob(os.path.join(spark_table, "data", "*", "_status=*", "*.parquet"))
    )
    assert set(committed) < on_disk

    # fresh-checkpoint replay: batch-1 docs anti-join away, batch-2 docs
    # commit exactly once -> identical to an uncrashed end-to-end run
    _run(spark, dirs, ckpt="ckpt2")
    from financial_big_data_spark.cache import release_tracked
    from financial_big_data_spark.plans.corpus_curation import curate_corpus

    docs = spark.createDataFrame(DOCS[:5], "doc_id long, text string")
    want = sorted(
        r.doc_id
        for r in curate_corpus(docs, min_tokens=1, near_dup_jaccard=0.5)
        .corpus.select("doc_id")
        .collect()
    )
    release_tracked()
    assert _accepted_ids(spark, dirs) == want
    # per-doc rows committed exactly once
    n = _read_committed(spark, spark_table).count()
    _run(spark, dirs, ckpt="ckpt3")
    assert _read_committed(spark, spark_table).count() == n


def test_crash_between_manifest_and_current_is_repaired(spark, dirs):
    """VERDICT r6 #3, crash window B: the writer dies AFTER publishing the
    manifest but BEFORE flipping CURRENT. The next state read completes
    the commit (single-writer repair) and the replay appends nothing."""
    import financial_big_data_spark.sources.versioned as V
    from financial_big_data_spark.streaming.ingest import _read_committed

    _write_batch(spark, dirs["in"], DOCS[:3])
    _run(spark, dirs)

    _write_batch(spark, dirs["in"], DOCS[3:5])
    orig = V._commit

    def torn(path, files, version):
        orig(path, files, version)
        # simulate the crash point: manifest linked, CURRENT flip lost
        with open(os.path.join(path, "_versions", "CURRENT"), "w") as fh:
            fh.write(str(version - 1))
        raise RuntimeError("crash between manifest claim and CURRENT flip")

    V._commit = torn
    try:
        with pytest.raises(Exception, match="crash between manifest"):
            _run(spark, dirs)
    finally:
        V._commit = orig

    vdir = os.path.join(dirs["table"], "_versions")
    assert open(os.path.join(vdir, "CURRENT")).read().strip() == "1"  # torn
    # the next read repairs: the published manifest becomes visible
    ids_after = _accepted_ids(spark, dirs)
    assert open(os.path.join(vdir, "CURRENT")).read().strip() == "2"
    assert set(ids_after) >= set(_accepted_ids(spark, dirs))  # stable reads

    # replay from a fresh checkpoint: everything already committed ->
    # no third version, same accepted set
    n = _read_committed(spark, dirs["table"]).count()
    _run(spark, dirs, ckpt="ckpt2")
    assert _read_committed(spark, dirs["table"]).count() == n
    assert _accepted_ids(spark, dirs) == ids_after
