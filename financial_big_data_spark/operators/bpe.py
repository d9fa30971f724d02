"""Distributed BPE (byte-pair-encoding) vocabulary learning + tokenizer.

The missing piece between "count tokens" and "train a model": learning
the subword vocabulary itself (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — the classic BPE merge
loop). The scale-critical observation the implementation is built on:
BPE trains on the WORD-FREQUENCY TABLE, not the raw corpus — one
corpus-wide shuffle builds (word, freq), and every one of the k merge
iterations then runs on that vocabulary-sized frame (still a DataFrame —
web-scale vocabularies are millions of rows — but orders of magnitude
below corpus size).

Per iteration:
1. adjacent symbol pairs explode from each word's current segmentation,
   weighted by word frequency → one pair-keyed aggregate (map-side
   partial);
2. the arg-max pair comes via a k=1 TakeOrderedAndProject with a
   deterministic (count desc, pair asc) tie-break — no global sort;
3. the merge applies to every word's symbol array in an Arrow-batched
   ``mapInPandas`` (merges are sequential within a word — the one
   genuinely iterative inner step, same boundary as the EWM recurrence).

``apply_bpe`` then segments text map-only with the learned merge list
broadcast in the closure — the trained-tokenizer path.

Parity: tests pin both the merge sequence and the segmentations against
a from-scratch pure-python reference implementation.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"


def _merge_word(symbols: list[str], left: str, right: str) -> list[str]:
    out = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def word_frequencies(
    docs: DataFrame, text: str = "text"
) -> DataFrame:
    """(word, freq) — the single corpus-wide pass BPE training needs."""
    return (
        docs.select(F.explode(F.split(F.col(text), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def learn_bpe_merges(
    docs: DataFrame, k: int = 20, text: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``k`` merges; returns [(left, right, pair_count)] in merge
    order. Deterministic: ties on pair count break lexicographically."""
    from ..cache import tracked_persist

    spark = docs.sparkSession
    vocab = word_frequencies(docs, text).withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""),
            F.array(F.lit(END)),
        ),
    )
    vocab = tracked_persist(vocab.select("syms", "freq"))
    vocab.count()
    merges: list[tuple[str, str, int]] = []
    pair_schema = T.StructType(
        [
            T.StructField("syms", T.ArrayType(T.StringType())),
            T.StructField("freq", T.LongType()),
        ]
    )
    for _ in range(k):
        pairs = (
            vocab.select(
                F.explode(
                    F.expr(
                        "transform(slice(syms, 1, size(syms) - 1), "
                        "(s, i) -> struct(s as l, syms[i + 1] as r))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("c"))
        )
        top = (
            pairs.orderBy(F.col("c").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["c"] < 2:
            break
        left, right, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
        merges.append((left, right, c))

        def apply_merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                pdf = pdf.copy()
                pdf["syms"] = [
                    _merge_word(list(s), left, right) for s in pdf["syms"]
                ]
                yield pdf

        new_vocab = tracked_persist(
            vocab.mapInPandas(apply_merge, pair_schema)
        )
        new_vocab.count()
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: Sequence[tuple[str, str, int]] | Sequence[tuple[str, str]],
    text: str = "text",
    id_col: str = "doc_id",
    out: str = "bpe_tokens",
) -> DataFrame:
    """Segment ``text`` with a learned merge list: docs + ``out`` array
    column of subword tokens (word-end markers stripped). Map-only; the
    merge list rides the closure broadcast."""
    merge_list = [(m[0], m[1]) for m in merges]
    out_schema = T.StructType(
        list(docs.schema.fields) + [T.StructField(out, T.ArrayType(T.StringType()))]
    )

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            col = []
            for txt in pdf[text]:
                toks: list[str] = []
                for word in (txt or "").split(" "):
                    if not word:
                        continue
                    syms = list(word) + [END]
                    for left, right in merge_list:
                        syms = _merge_word(syms, left, right)
                    toks.extend(s.removesuffix(END) for s in syms)
                col.append(toks)
            pdf[out] = col
            yield pdf

    return docs.mapInPandas(seg, out_schema)
