"""Context-window packing: assign documents to fixed-token-budget packs.

The standard pretraining "concat-then-chunk" layout: documents are laid
end-to-end in a deterministic global order and the stream is cut every
``budget`` tokens; a document belongs to the pack where its FIRST token
lands. Sequential greedy bin-packing is inherently serial (each decision
depends on the previous), but concat-then-chunk is order-parallel: pack id
is a pure function of the document's global start offset, which is a
global running sum — computed shuffle-light by the two-phase
``functions.stats.global_running_sum`` (range-bucketed local cumsums +
broadcast prefix offsets; no global-ORDER-BY window, no single-task
funnel). Extension operator of the training-data layer (no reference
counterpart).

Boundary semantics: a document straddling a cut spills into its pack, so
a pack's token sum may exceed ``budget`` by at most (longest doc − 1)
tokens; every pack's START is exactly aligned to a multiple of ``budget``.
Pipelines that truncate instead of spilling drop the tail — that choice
is the trainer's, not the packer's; ``pack_stats`` reports the spill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stats import global_running_sum


def pack_documents(
    docs: DataFrame,
    tokens: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 2048,
    order_col: str | None = None,
) -> DataFrame:
    """docs + (start_offset, pack_id, pos_in_pack).

    ``order_col`` (default ``id_col``) fixes the global concatenation
    order and must be unique — pack assignment is then deterministic
    under any physical layout. Zero-token documents get a position in
    the stream but occupy no budget.
    """
    order_col = order_col or id_col
    cum = global_running_sum(docs, order_col, tokens, out="_cum_tokens")
    start = (F.col("_cum_tokens") - F.col(tokens)).alias("start_offset")
    out = cum.select("*", start).withColumn(
        "pack_id", F.floor(F.col("start_offset") / F.lit(budget))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("pack_id").orderBy(order_col)
    return out.withColumn("pos_in_pack", F.row_number().over(w)).drop("_cum_tokens")


def chunk_documents(
    docs: DataFrame,
    chunk: int = 64,
    stride: int = 48,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window document chunking: split each document into
    fixed-size overlapping token windows — the standard layout for
    context-window training samples and RAG passage indexes (overlap =
    ``chunk - stride`` tokens keeps boundary context in both pieces).

    Returns one row per (document, window): (id, chunk_idx, start_tok
    0-based, n_chunk_tokens, chunk_text). Chunk count is
    ``1 + ceil((n - chunk)/stride)`` (one chunk when n ≤ chunk; the final
    chunk may be short — truncation is the trainer's choice downstream).

    Map-only: tokenize → per-row ``sequence`` of window starts → explode →
    ``slice``/``array_join``. No shuffle, no key — embarrassingly parallel
    at corpus scale; output size is the only cost (≈ chunk/stride × input
    tokens), which is inherent to overlapped chunking, not to the plan.

    Tokenization is the bare single-space split shared with the token/
    quality operators so the DuckDB oracle (``string_split`` +
    ``generate_series`` + ``list_slice``) reproduces it byte-for-byte.
    """
    if stride <= 0 or chunk <= 0:
        raise ValueError(f"chunk={chunk} and stride={stride} must be positive")
    # Materialize the token array BEFORE the generate: referencing the
    # `_toks` attribute (not the split expression) in both the chunk-count
    # and the slice keeps the tokenizer to ONE evaluation per document —
    # Catalyst does not CSE a repeated split() across a Generate boundary.
    base = docs.select(F.col(id_col), F.split(F.col(text), " ").alias("_toks"))
    n = F.size(F.col("_toks"))
    n_chunks = F.when(n <= chunk, F.lit(1)).otherwise(
        F.lit(1) + F.ceil((n - F.lit(chunk)).cast("double") / F.lit(stride)).cast("int")
    )
    with_idx = base.select(
        F.col(id_col),
        F.col("_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * F.lit(stride)
    piece = F.slice(F.col("_toks"), start + 1, chunk)
    return with_idx.select(
        F.col(id_col),
        F.col("chunk_idx"),
        start.cast("bigint").alias("start_tok"),
        F.size(piece).alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def pack_stats(
    packed: DataFrame, budget: int, tokens: str = "n_tokens"
) -> DataFrame:
    """Per-pack audit: (pack_id, n_docs, pack_tokens, spill_tokens).

    ``spill_tokens`` = tokens beyond the pack's budget boundary contributed
    by its straddling last document (0 for packs cut exactly); one hash
    aggregate keyed by pack id.
    """
    pack_end = F.max(F.col("start_offset") + F.col(tokens))
    return (
        packed.groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens).alias("pack_tokens"),
            F.greatest(
                pack_end - (F.col("pack_id") + 1) * F.lit(budget), F.lit(0)
            ).alias("spill_tokens"),
        )
        .orderBy("pack_id")
    )
