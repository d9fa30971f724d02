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
