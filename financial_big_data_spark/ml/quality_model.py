"""Model-based corpus quality scoring: a seed-vs-corpus classifier.

The heuristic gates (operators/quality.py) catch mechanical junk —
repetition, length, boilerplate. The next stage of web-scale curation is
MODEL-based filtering: train a linear classifier to distinguish a trusted
seed corpus from the raw crawl, score every document with it, and
keep/weight documents by the classifier probability — the GPT-3/CCNet
data-curation approach (Brown et al. 2020, Appendix A; Wenzek et al.
2020). The reference has no model-based gate (its corpus is exchange
data); this is a north-star training-data operator.

Spark-first shape, fully distributed, zero Python UDFs:

- features: MLlib ``Tokenizer`` → ``HashingTF`` — a hashed bag of words
  into a FIXED 2^18 space, so there is no vocabulary build, no
  vocabulary shuffle, and the model is a dense coefficient vector of
  constant size regardless of corpus size;
- negatives: an equal-sized LAYOUT-INVARIANT sample of the non-seed
  corpus (operators.sketches.bottomk_rows — deterministic by md5 of the
  id, not a ``df.sample`` whose content depends on partitioning);
- training: MLlib ``LogisticRegression`` (distributed L-BFGS);
- scoring: one ``model.transform`` pass over the corpus — map-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import bottomk_rows


def seed_quality_scores(
    docs: DataFrame,
    seed_ids: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    num_features: int = 2**18,
    reg_param: float = 0.01,
    max_iter: int = 20,
) -> DataFrame:
    """Score every document by P(seed-like): (id, quality_score).

    ``seed_ids`` is a one-column frame of trusted ids (its other columns
    are ignored). Negatives are a deterministic bottom-k hash sample of
    the rest, sized to the positive count — balanced classes without a
    corpus-count-dependent fraction.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Tokenizer
    from pyspark.ml.functions import vector_to_array

    seed_keys = seed_ids.select(F.col(seed_ids.columns[0]).alias(id_col)).distinct()
    pos = docs.join(seed_keys, id_col, "left_semi").select(
        id_col, text
    ).withColumn("label", F.lit(1.0))
    rest = docs.join(seed_keys, id_col, "left_anti").select(id_col, text)
    n_pos = pos.count()
    if n_pos == 0:
        raise ValueError("seed_ids matched no documents")
    neg = bottomk_rows(rest, n_pos, [id_col], keep=[text]).withColumn(
        "label", F.lit(0.0)
    )
    train = pos.unionByName(neg.select(id_col, text, "label"))

    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol=text, outputCol="_words"),
            HashingTF(
                inputCol="_words", outputCol="_features", numFeatures=num_features
            ),
            LogisticRegression(
                featuresCol="_features",
                labelCol="label",
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    model = pipe.fit(train)
    scored = model.transform(docs.select(id_col, text))
    return scored.select(
        id_col,
        F.element_at(vector_to_array("probability"), 2).alias("quality_score"),
    )
