"""Benchmark-contamination detection + context-window packing operators."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.contamination import (
    flag_contaminated,
    ngram_overlap,
)
from financial_big_data_spark.operators.packing import pack_documents, pack_stats


def _grams(text: str, n: int) -> set[str]:
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(50)]
    rows = [
        (i, " ".join(rng.choice(words, size=30).tolist())) for i in range(12)
    ]
    rows.append((12, "tiny doc"))  # shorter than n tokens
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ngram_overlap_matches_set_reference(spark, corpus):
    """Planted contamination: the benchmark holds doc 0 verbatim and the
    first half of doc 1; per-doc overlap must equal the python-set answer."""
    docs = {r.doc_id: r.text for r in corpus.collect()}
    half1 = " ".join(docs[1].split()[:15])
    bench = spark.createDataFrame(
        [(docs[0],), (half1,), ("completely unrelated benchmark prose here",)],
        "text string",
    )
    n = 3
    bench_grams = _grams(docs[0], n) | _grams(half1, n) | _grams(
        "completely unrelated benchmark prose here", n
    )
    got = {r.doc_id: r for r in ngram_overlap(corpus, bench, n=n).collect()}
    assert set(got) == set(docs)
    for did, text in docs.items():
        g = _grams(text, n)
        exp_total, exp_match = len(g), len(g & bench_grams)
        assert got[did].n_grams == exp_total, did
        assert got[did].n_matched == exp_match, did
        if exp_total:
            assert abs(got[did].overlap - exp_match / exp_total) < 1e-12
        else:
            assert got[did].overlap is None  # too-short doc: reported, not dropped
    assert got[0].overlap == 1.0  # verbatim copy
    assert 0.0 < got[1].overlap < 1.0  # partial copy


def test_flag_contaminated_threshold(spark, corpus):
    docs = {r.doc_id: r.text for r in corpus.collect()}
    bench = spark.createDataFrame([(docs[0],), (docs[3],)], "text string")
    flagged = {r.doc_id for r in flag_contaminated(corpus, bench, threshold=0.9, n=3).collect()}
    assert flagged == {0, 3}


def test_ngram_overlap_shuffle_join_mode_matches(spark, corpus):
    docs = {r.doc_id: r.text for r in corpus.collect()}
    bench = spark.createDataFrame([(docs[2],)], "text string")
    a = {
        (r.doc_id, r.n_matched)
        for r in ngram_overlap(corpus, bench, n=3, broadcast_benchmark=True).collect()
    }
    b = {
        (r.doc_id, r.n_matched)
        for r in ngram_overlap(corpus, bench, n=3, broadcast_benchmark=False).collect()
    }
    assert a == b


@pytest.fixture(scope="module")
def token_docs(spark):
    rng = np.random.default_rng(11)
    rows = [(i, int(rng.integers(1, 40))) for i in range(200)]
    rows[50] = (50, 0)  # zero-token doc
    return spark.createDataFrame(rows, "doc_id long, n_tokens int")


def test_pack_documents_matches_pandas_reference(spark, token_docs):
    """Concat-then-chunk: pack id = floor(start_offset / budget) where the
    start offset is the exclusive running token sum in doc_id order."""
    budget = 100
    pdf = token_docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    pdf["start"] = pdf["n_tokens"].cumsum() - pdf["n_tokens"]
    pdf["pack"] = pdf["start"] // budget
    expected = dict(zip(pdf["doc_id"], zip(pdf["start"], pdf["pack"])))
    got = {
        r.doc_id: (r.start_offset, r.pack_id)
        for r in pack_documents(token_docs, budget=budget).collect()
    }
    assert got == {k: (int(s), int(p)) for k, (s, p) in expected.items()}


def test_pack_documents_layout_invariant(spark, token_docs):
    budget = 100
    base = {
        r.doc_id: r.pack_id for r in pack_documents(token_docs, budget=budget).collect()
    }
    shuffled = {
        r.doc_id: r.pack_id
        for r in pack_documents(token_docs.repartition(7), budget=budget).collect()
    }
    assert base == shuffled


def test_pack_stats_spill_bounded(spark, token_docs):
    budget = 100
    packed = pack_documents(token_docs, budget=budget)
    stats = pack_stats(packed, budget=budget).collect()
    max_doc = token_docs.agg(F.max("n_tokens")).collect()[0][0]
    total_docs = token_docs.count()
    assert sum(r.n_docs for r in stats) == total_docs
    for r in stats:
        # every pack starts on a budget boundary → spill < longest doc
        assert 0 <= r.spill_tokens < max_doc
    # pos_in_pack is 1..n_docs within each pack
    pos = packed.groupBy("pack_id").agg(
        F.min("pos_in_pack").alias("lo"), F.max("pos_in_pack").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    for r in pos.collect():
        assert r.lo == 1 and r.hi == r.n
