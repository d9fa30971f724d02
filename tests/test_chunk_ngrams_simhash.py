"""Pins for the round-6 curation operators: SimHash hamming near-dup join
(dedup.simhash_near_dups), sliding-window chunking (packing.chunk_documents)
and corpus boilerplate n-grams (quality.top_ngrams).

The DuckDB oracle hash-checks all three against real test data
(doc_simhash_pairs / doc_chunks / doc_top_ngrams); here we pin the
hand-computable semantics on tiny planted corpora, plus the banded
filter's exactness guarantee against explicit brute force.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.dedup import simhash, simhash_near_dups
from financial_big_data_spark.operators.packing import chunk_documents
from financial_big_data_spark.operators.quality import top_ngrams


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "spark shuffles data between stages when keys must be colocated for joins",
        "completely different vocabulary entirely disjoint token stream here now",
        "market regimes transition between trending and ranging states over time",
    ]
    texts = list(base)
    texts.append(base[0])                      # exact copy -> hamming 0
    texts.append(base[1] + " appended")        # near variant -> small hamming
    texts.append("zz" + base[2])               # mutated first token
    return _docs(spark, texts)


def test_simhash_near_dups_matches_bruteforce(spark, near_dup_corpus):
    """Pigeonhole exactness: the banded candidate join must recover exactly
    the pairs a brute-force all-pairs hamming comparison finds."""
    bits, n_bands, max_h = 48, 8, 6
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(
            near_dup_corpus, bits=bits, n_bands=n_bands, max_hamming=max_h
        ).collect()
    }
    sh = {
        r["doc_id"]: r["simhash"]
        for r in simhash(near_dup_corpus, bits=bits).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(sh), 2):
        h = bin(sh[a] ^ sh[b]).count("1")
        if h <= max_h:
            want[(a, b)] = h
    assert got == want
    assert want[(0, 4)] == 0  # the exact copy


def test_simhash_near_dups_exact_copy_is_hamming_zero(spark, near_dup_corpus):
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_dups(near_dup_corpus).collect()
    }
    assert out[(0, 4)] == 0


def test_simhash_near_dups_validation(spark, near_dup_corpus):
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(near_dup_corpus, n_bands=3, max_hamming=3)
    with pytest.raises(ValueError, match="divide"):
        simhash_near_dups(near_dup_corpus, bits=48, n_bands=5, max_hamming=3)


def test_simhash_near_dups_plans_as_equi_join(spark, near_dup_corpus):
    """The banded candidate join must plan as a hash/sort-merge EQUI-join
    on (band, band value) — never an all-pairs nested-loop/cartesian."""
    plan = (
        simhash_near_dups(near_dup_corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_chunk_documents_boundaries(spark):
    toks = [f"t{i}" for i in range(10)]
    out = (
        chunk_documents(_docs(spark, [" ".join(toks), "a b c"]), chunk=4, stride=3)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    doc0 = [r for r in out if r["doc_id"] == 0]
    # n=10, chunk=4, stride=3 -> 1 + ceil(6/3) = 3 chunks at starts 0, 3, 6
    assert [(r["chunk_idx"], r["start_tok"]) for r in doc0] == [(0, 0), (1, 3), (2, 6)]
    assert doc0[0]["chunk_text"] == "t0 t1 t2 t3"
    assert doc0[1]["chunk_text"] == "t3 t4 t5 t6"
    assert doc0[2]["chunk_text"] == "t6 t7 t8 t9"
    assert all(r["n_chunk_tokens"] == 4 for r in doc0)
    # successive chunks overlap by chunk - stride = 1 token
    doc1 = [r for r in out if r["doc_id"] == 1]
    assert len(doc1) == 1 and doc1[0]["chunk_text"] == "a b c"
    assert doc1[0]["n_chunk_tokens"] == 3


def test_chunk_documents_short_final_chunk(spark):
    # n=7, chunk=4, stride=3 -> chunks at 0 and 3; second chunk has 4 toks;
    # n=8 -> starts 0, 3, 6; final chunk holds only 2 tokens
    out = (
        chunk_documents(
            _docs(spark, [" ".join(f"x{i}" for i in range(8))]), chunk=4, stride=3
        )
        .orderBy("chunk_idx")
        .collect()
    )
    assert [r["n_chunk_tokens"] for r in out] == [4, 4, 2]
    assert out[-1]["chunk_text"] == "x6 x7"


def test_chunk_documents_is_map_only(spark):
    plan = (
        chunk_documents(_docs(spark, ["a b c d e"]), chunk=2, stride=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_chunk_documents_validation(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, ["a"]), chunk=0, stride=3)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, ["a"]), chunk=3, stride=0)


def test_top_ngrams_document_frequency_and_ties(spark):
    # "a b c" appears in docs 0,1,2 (df 3; twice inside doc 0 -> still 3);
    # "b c d" in docs 0,1 (df 2); "x y z" in doc 3 only (df 1)
    corpus = _docs(
        spark,
        [
            "a b c d a b c",   # contains "a b c" twice, "b c d" once
            "a b c d",
            "a b c",
            "x y z",
        ],
    )
    out = top_ngrams(corpus, n=3, k=3).orderBy("rank").collect()
    assert [(r["rank"], r["ngram"], r["df"]) for r in out][:2] == [
        (1, "a b c", 3),
        (2, "b c d", 2),
    ]
    # rank 3 is a df-1 tie broken lexicographically: "b c a"? no such gram —
    # candidates are "c d a" / "d a b" (doc 0) and "x y z" (doc 3);
    # "c d a" sorts first
    assert (out[2]["ngram"], out[2]["df"]) == ("c d a", 1)


def test_zipf_profile_hand_ols(spark):
    """Known frequencies: 'a'×4 'b'×2 'c'×1 → ranks 1,2,3; the regr_*
    aggregates must match a hand-computed OLS of ln(freq) on ln(rank)."""
    import numpy as np

    from financial_big_data_spark.operators.quality import zipf_profile

    row = zipf_profile(_docs(spark, ["a a b c", "a a b"])).collect()[0]
    assert row["n_tokens"] == 7 and row["vocab_size"] == 3
    x = np.log([1.0, 2.0, 3.0])
    y = np.log([4.0, 2.0, 1.0])
    slope, intercept = np.polyfit(x, y, 1)
    r = np.corrcoef(x, y)[0, 1]
    assert row["zipf_slope"] == pytest.approx(slope, abs=1e-6)
    assert row["zipf_intercept"] == pytest.approx(intercept, abs=1e-6)
    assert row["zipf_r2"] == pytest.approx(r * r, abs=1e-6)


def test_zipf_profile_rank_tiebreak(spark):
    """Equal-frequency terms rank by term asc — the (freq desc, term asc)
    total order keeps the regression input identical across engines and
    layouts. With all counts equal the fit is a flat line (slope 0); the
    SQL-standard REGR_R2 defines var(y)=0, var(x)≠0 as R² = 1 — both
    engines implement that convention."""
    from financial_big_data_spark.operators.quality import zipf_profile

    row = zipf_profile(_docs(spark, ["x y z"])).collect()[0]
    assert row["vocab_size"] == 3 and row["n_tokens"] == 3
    assert row["zipf_slope"] == 0.0 and row["zipf_r2"] == 1.0


def test_top_ngrams_k_bounds(spark):
    corpus = _docs(spark, ["a b c d", "a b c"])
    out = top_ngrams(corpus, n=3, k=100).collect()
    # only 2 distinct trigrams exist ("a b c", "b c d"); k larger than the
    # universe is safe
    assert len(out) == 2
