"""Benchmark-contamination detection: n-gram overlap against a held-out set.

The standard LLM-pretraining hygiene check (GPT-3 used 13-gram collisions,
PaLM/Llama 8-grams): a training document is contaminated when a large
fraction of its word n-grams also appear in an evaluation benchmark. This
is an extension operator of the training-data layer (no reference
counterpart — the reference has no corpus tooling).

Scale shape (100 TB corpus, small benchmark — the real-world asymmetry):

- both sides shingle relationally (``dedup.shingle_table``: posexplode +
  one window pass, single exchange on the doc id);
- n-grams are compared as ``xxhash64`` 64-bit keys, so the join ships
  8-byte longs, never the gram strings;
- the benchmark gram set (typically ≤ millions of grams) broadcasts, and
  the match test is a broadcast LEFT SEMI join against the corpus gram
  table — map-only over the corpus, no corpus shuffle beyond the one
  inside the shingle window;
- the per-doc overlap is one hash aggregate keyed by doc id.

With ``broadcast_benchmark=False`` the semi-join becomes a shuffle
hash/sort-merge join on the gram hash — for the rare benchmark too big to
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_table


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    bench_text: str | None = None,
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-corpus-document n-gram overlap with the benchmark set.

    Returns (id_col, n_grams, n_matched, overlap) where overlap =
    n_matched / n_grams over the document's DISTINCT word n-grams
    (documents shorter than ``n`` tokens have n_grams = 0 and NULL
    overlap — too short to carry a full n-gram, reported, not dropped).
    """
    bench_text = bench_text or text
    grams = shingle_table(corpus, text=text, id_col=id_col, n=n, distinct=True)
    cg = grams.select(F.col(id_col), F.xxhash64("shingle").alias("_g"))
    # per-benchmark-doc id for the shingle window: a text hash is
    # deterministic under any layout (monotonically_increasing_id is not);
    # identical benchmark docs collapsing to one id is harmless — their
    # gram sets are identical and the gram table is distinct'd anyway
    bg = (
        shingle_table(
            benchmark.select(
                F.xxhash64(F.col(bench_text)).alias("_bid"), F.col(bench_text)
            ),
            text=bench_text,
            id_col="_bid",
            n=n,
            distinct=False,
        )
        .select(F.xxhash64("shingle").alias("_g"))
        .distinct()
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    # ONE pass over the corpus gram table: a left join against the (tiny)
    # benchmark gram set marks hits, and a single hash aggregate produces
    # both the total and the matched count — a semi-join + separate totals
    # aggregate would execute the shingle-window lineage twice.
    hits = cg.join(bg.withColumn("_hit", F.lit(1)), on="_g", how="left")
    counts = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_matched"),
    )
    ids = corpus.select(id_col)
    return ids.join(counts, on=id_col, how="left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
        F.try_divide(
            F.coalesce("n_matched", F.lit(0)), F.coalesce("n_grams", F.lit(0))
        ).alias("overlap"),
    )


def flag_contaminated(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.2,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Corpus rows whose benchmark n-gram overlap ≥ ``threshold`` —
    the removal list a decontamination pass anti-joins against."""
    overlap = ngram_overlap(
        corpus,
        benchmark,
        text=text,
        id_col=id_col,
        n=n,
        broadcast_benchmark=broadcast_benchmark,
    )
    return overlap.where(F.col("overlap") >= threshold)
