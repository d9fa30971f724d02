"""Seed-vs-corpus quality classifier: held-out separation on planted
vocabularies, negative-sample determinism, and validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.ml.quality_model import seed_quality_scores

CURATED = [
    "the committee published a detailed annual report on regional trade",
    "researchers measured the effect of interest rates on capital flows",
    "the council approved a framework for sustainable urban development",
    "analysts reviewed quarterly earnings across the manufacturing sector",
    "the study examined long term trends in labor market participation",
    "historians documented the economic reforms of the early republic",
    "the agency released guidance on municipal infrastructure financing",
    "economists compared productivity growth across member states",
]
JUNK = [
    "zzz qqq xxx click here free free win win win",
    "qwk jxv bnm plo aaa bbb ccc ddd eee fff",
    "buy buy buy cheap cheap deals deals deals now now",
    "xoxo lol omg wtf brb 11111 22222 33333",
    "asdf asdf asdf jkl jkl jkl qwer qwer",
    "zxcv zxcv spam spam spam spam offer offer",
    "111 222 333 444 555 666 777 888 999",
    "hjk hjk hjk wub wub wub yolo yolo yolo",
]


@pytest.fixture(scope="module")
def planted(spark):
    """Seed (curated prose), a crawl that is overwhelmingly junk (the
    realistic negative pool — the sampled negatives are then junk up to
    label noise), and a few held-out curated docs hiding in the crawl."""
    rows = []
    for i, t in enumerate(CURATED):
        rows.append((i, t, "seed"))                 # training positives
        rows.append((100 + i, t + " moreover the findings were robust", "heldout_good"))
    for rep in range(6):
        for i, t in enumerate(JUNK):
            salt = f" {'waka' * (rep % 3 + 1)} {rep}{i}"
            rows.append((200 + rep * 10 + i, t + salt, "crawl_junk"))
    return spark.createDataFrame(rows, "doc_id long, text string, kind string")


def test_seed_classifier_separates_heldout(spark, planted):
    seed = planted.where(F.col("kind") == "seed").select("doc_id")
    scores = seed_quality_scores(planted, seed).join(
        planted.select("doc_id", "kind"), "doc_id"
    )
    by_kind = {
        r.kind: r.avg
        for r in scores.groupBy("kind").agg(F.avg("quality_score").alias("avg")).collect()
    }
    # held-out curated prose (NOT in the seed) must outscore junk
    assert by_kind["heldout_good"] > by_kind["crawl_junk"] + 0.2
    assert by_kind["seed"] > 0.5


def test_negative_sample_layout_invariant(spark, planted):
    """The negative sample is a hash function of ids — repartitioning the
    corpus must not change which negatives train the model (scores
    identical run-to-run)."""
    seed = planted.where(F.col("kind") == "seed").select("doc_id")
    a = {
        r.doc_id: round(r.quality_score, 9)
        for r in seed_quality_scores(planted.repartition(1), seed).collect()
    }
    b = {
        r.doc_id: round(r.quality_score, 9)
        for r in seed_quality_scores(planted.repartition(7), seed).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-6)


def test_empty_seed_rejected(spark, planted):
    empty = planted.where(F.lit(False)).select("doc_id")
    with pytest.raises(ValueError):
        seed_quality_scores(planted, empty)


def test_nb_twin_separates_seed_from_rest(spark):
    """The closed-form Naive-Bayes twin (q_doc_quality_scores) must give
    seed-class documents higher scores than the sampled negatives on the
    real documents table — the scoring path it hash-checks is only a
    meaningful twin if it also behaves like a quality model."""
    from financial_big_data_spark.queries import q_doc_quality_scores

    sf_dir = "/root/testdata/sf0.001"
    out = q_doc_quality_scores(spark, sf_dir).cache()
    try:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "lang"
        )
        joined = out.join(docs, "doc_id")
        pos_avg = (
            joined.where((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0))
            .agg(F.avg("quality_score"))
            .first()[0]
        )
        rest_avg = (
            joined.where(~((F.col("lang") == "en") & (F.col("doc_id") % 2 == 0)))
            .agg(F.avg("quality_score"))
            .first()[0]
        )
        assert pos_avg > rest_avg
        # scores are probabilities
        lo, hi = out.agg(F.min("quality_score"), F.max("quality_score")).first()
        assert 0.0 <= lo <= hi <= 1.0
    finally:
        out.unpersist()
