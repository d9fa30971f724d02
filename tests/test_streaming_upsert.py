"""Streaming upsert sink: batch-MERGE parity, last-wins within a batch,
replay idempotency, and untouched-partition preservation."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.streaming.upsert import latest_per_key, streaming_upsert


@pytest.fixture()
def dirs():
    root = tempfile.mkdtemp(prefix="stream_upsert_")
    paths = {n: os.path.join(root, n) for n in ("table", "in", "ckpt", "ckpt2")}
    os.makedirs(paths["in"])
    yield paths
    shutil.rmtree(root, ignore_errors=True)


def _seed_table(spark, path):
    seed = spark.createDataFrame(
        [(1, "a", "2024-01-01", 10.0), (2, "b", "2024-01-01", 20.0),
         (3, "c", "2024-01-02", 30.0), (4, "d", "2024-01-03", 40.0)],
        "id long, name string, day string, v double",
    )
    seed.write.partitionBy("day").parquet(path)


def _updates(spark):
    # id 2 updated twice in-batch (seq 5 must win), id 3 updated once,
    # id 9 is new; day-2024-01-03 (id 4) untouched
    return spark.createDataFrame(
        [(2, "b1", "2024-01-01", 21.0, 4), (2, "b2", "2024-01-01", 22.0, 5),
         (3, "c1", "2024-01-02", 31.0, 4), (9, "z", "2024-01-02", 90.0, 4)],
        "id long, name string, day string, v double, seq long",
    )


def _run_stream(spark, dirs, ckpt="ckpt"):
    updates_schema = _updates(spark).schema
    stream = spark.readStream.schema(updates_schema).parquet(dirs["in"])
    q = streaming_upsert(
        stream, dirs["table"], key="id", partition_col="day",
        checkpoint=dirs[ckpt], order="seq",
    )
    q.awaitTermination(180)


def _table_state(spark, path):
    # partition-column type inference reads day=2024-01-01 back as a DATE;
    # normalize through str() for comparison
    return {
        r.id: (r.name, str(r.day), r.v)
        for r in spark.read.parquet(path).select("id", "name", "day", "v").collect()
    }


EXPECTED = {
    1: ("a", "2024-01-01", 10.0),
    2: ("b2", "2024-01-01", 22.0),  # seq 5 wins over seq 4
    3: ("c1", "2024-01-02", 31.0),
    4: ("d", "2024-01-03", 40.0),   # untouched partition
    9: ("z", "2024-01-02", 90.0),   # insert
}


def test_streaming_upsert_merges_batch(spark, dirs):
    _seed_table(spark, dirs["table"])
    _updates(spark).coalesce(1).write.mode("append").parquet(dirs["in"])
    untouched = {
        f: os.path.getmtime(f)
        for f in __import__("glob").glob(
            os.path.join(dirs["table"], "day=2024-01-03", "*.parquet")
        )
    }
    assert untouched
    _run_stream(spark, dirs)
    assert _table_state(spark, dirs["table"]) == EXPECTED
    for f, mt in untouched.items():
        assert os.path.getmtime(f) == mt  # untouched partition files intact


def test_streaming_upsert_replay_idempotent(spark, dirs):
    """Re-processing the same input with a FRESH checkpoint (the worst-case
    replay: every batch re-runs) converges to the same table state."""
    _seed_table(spark, dirs["table"])
    _updates(spark).coalesce(1).write.mode("append").parquet(dirs["in"])
    _run_stream(spark, dirs)
    _run_stream(spark, dirs, ckpt="ckpt2")  # full replay
    assert _table_state(spark, dirs["table"]) == EXPECTED


def test_streaming_upsert_bootstraps_missing_table(spark, dirs):
    _updates(spark).coalesce(1).write.mode("append").parquet(dirs["in"])
    _run_stream(spark, dirs)
    state = _table_state(spark, dirs["table"])
    assert state[2] == ("b2", "2024-01-01", 22.0)
    assert set(state) == {2, 3, 9}


def test_latest_per_key_deterministic_under_layout(spark):
    rows = [(1, i, f"v{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "id long, seq long, val string")
    for parts in (1, 7):
        got = latest_per_key(df.repartition(parts), "id", "seq").collect()
        assert [(r.id, r.seq, r.val) for r in got] == [(1, 49, "v49")]


def test_streaming_append_keeps_distinct_matview_current(spark, tmp_path):
    """Append-only streaming ingest + HLL register view: after the stream
    drains, the maintained registers equal a from-scratch sketch of the
    final table (per-batch maintenance scanned only each batch's files)."""
    import time as _time

    from pyspark.sql import functions as F

    from financial_big_data_spark.operators.sketches import hll_sketch
    from financial_big_data_spark.sources.versioned import read_version
    from financial_big_data_spark.streaming.upsert import (
        streaming_append_with_distinct_matview,
    )

    d = str(tmp_path)
    indir, table, view, ckpt = f"{d}/in", f"{d}/table", f"{d}/view", f"{d}/ckpt"
    df = spark.range(600).select(
        F.col("id"),
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 53).cast("string").alias("u"),
    )
    for j, (lo, hi) in enumerate([(0, 200), (200, 400), (400, 600)]):
        df.where((F.col("id") >= lo) & (F.col("id") < hi)).coalesce(1).write.mode(
            "append"
        ).parquet(indir)
        _time.sleep(1.1)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(indir)
    )
    q = streaming_append_with_distinct_matview(
        stream, table, key="id", checkpoint=ckpt,
        view_path=view, group="g", value="u", b=6,
    )
    q.awaitTermination(180)
    got = {(r.g, r.bucket, r.rho) for r in read_version(spark, view).collect()}
    want = {
        (r.g, r.bucket, r.rho)
        for r in hll_sketch(read_version(spark, table), value="u", b=6, by=["g"]).collect()
    }
    assert got == want
    assert read_version(spark, table).count() == 600


def test_streaming_append_sink_tolerates_non_monotone_new_keys(spark, tmp_path):
    """ADVICE r8: the sink commits through append_version, so a stream
    honoring the brand-new-keys contract with NON-monotone keys (batch 2
    interleaves below batch 1's range) must never rewrite a file — and
    therefore never trip the refresh's non-append-DML error."""
    import time as _time

    from pyspark.sql import functions as F

    from financial_big_data_spark.operators.sketches import hll_sketch
    from financial_big_data_spark.sources.versioned import (
        _load_manifest,
        read_version,
    )
    from financial_big_data_spark.streaming.upsert import (
        streaming_append_with_distinct_matview,
    )

    d = str(tmp_path)
    indir, table, view, ckpt = f"{d}/in", f"{d}/table", f"{d}/view", f"{d}/ckpt"
    df = spark.range(300).select(
        F.col("id"),
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 29).cast("string").alias("u"),
    )
    # batch 1: even ids; batch 2: odd ids — every batch-2 key lands INSIDE
    # batch 1's footer key range (the case that rewrote files before)
    for cond in (F.col("id") % 2 == 0, F.col("id") % 2 == 1):
        df.where(cond).coalesce(1).write.mode("append").parquet(indir)
        _time.sleep(1.1)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(indir)
    )
    q = streaming_append_with_distinct_matview(
        stream, table, key="id", checkpoint=ckpt,
        view_path=view, group="g", value="u", b=6,
    )
    q.awaitTermination(180)
    assert q.exception() is None
    # strictly-appended manifests: v1's files all survive into v2
    f1 = set(_load_manifest(table, 1)["files"])
    f2 = set(_load_manifest(table, 2)["files"])
    assert f1 < f2
    got = {(r.g, r.bucket, r.rho) for r in read_version(spark, view).collect()}
    want = {
        (r.g, r.bucket, r.rho)
        for r in hll_sketch(read_version(spark, table), value="u", b=6, by=["g"]).collect()
    }
    assert got == want
    assert read_version(spark, table).count() == 300
