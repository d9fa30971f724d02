"""Streaming ingest into the persisted ANN index (streaming/ann.py):
one snapshot commit per micro-batch against frozen codebooks; the
replay-equals-batch hash check itself lives in the registry
(`emb_streaming_index`, same oracle as `emb_index_incremental`)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.sources.ann_index import build_ann_index
from financial_big_data_spark.sources.versioned import (
    current_version,
    read_version,
)
from financial_big_data_spark.streaming.ann import streaming_append_to_ann_index
from tests.test_ann_index import _pinned_codebooks, _vecs


def test_one_snapshot_per_microbatch_and_frozen_encode(spark, tmp_path):
    b1 = _vecs(spark, 60, seed=40)
    idx = str(tmp_path / "idx")
    build_ann_index(
        spark, b1, idx, m=4, nbits=3, n_cells=None,
        codebooks=_pinned_codebooks(spark, b1), normalize=False,
    )
    # 3 stream files -> 3 micro-batches (maxFilesPerTrigger=1)
    sdir = str(tmp_path / "stream")
    os.makedirs(sdir)
    for j in range(3):
        _vecs(spark, 10, seed=41 + j, id_start=60 + 10 * j).coalesce(
            1
        ).write.parquet(f"{sdir}/f{j}")
        t = 1_700_000_000 + 60 * j
        fdir = f"{sdir}/f{j}"
        for p in os.listdir(fdir):
            os.utime(os.path.join(fdir, p), (t, t))
    schema = spark.read.parquet(f"{sdir}/f0").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sdir}/f*")
    )
    q = streaming_append_to_ann_index(
        stream, idx, checkpoint=str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(600)
    q.stop()
    assert current_version(f"{idx}/codes") == 4  # build + 3 batch commits
    got = {r.vec_id for r in read_version(spark, f"{idx}/codes").collect()}
    assert got == set(range(90))
    # frozen-encode invariant: streamed codes == a fresh build-on-union
    full = str(tmp_path / "full")
    allv = b1
    for j in range(3):
        allv = allv.unionByName(_vecs(spark, 10, seed=41 + j, id_start=60 + 10 * j))
    build_ann_index(
        spark, allv, full, m=4, nbits=3, n_cells=None,
        codebooks=_pinned_codebooks(spark, b1), normalize=False,
    )
    inc = {(r.vec_id, tuple(r.codes)) for r in read_version(spark, f"{idx}/codes").collect()}
    ref = {(r.vec_id, tuple(r.codes)) for r in read_version(spark, f"{full}/codes").collect()}
    assert inc == ref


def test_stream_cannot_bootstrap_index(spark, tmp_path):
    os.makedirs(tmp_path / "empty_src")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .parquet(str(tmp_path / "empty_src"))
    )
    with pytest.raises(FileNotFoundError, match="no ANN index"):
        streaming_append_to_ann_index(
            stream, str(tmp_path / "no_idx"), checkpoint=str(tmp_path / "c")
        )
