"""Streaming ingest into the persisted ANN index (sources/ann_index.py).

The streaming face of the round-12 index artifact: a live embedding
stream (new documents' vectors) keeps the SAME queryable index current —
each micro-batch encodes against the FROZEN codebooks/centroids/rotation
(broadcast state, one pass over the batch) and lands as ONE append-only
snapshot commit on the codes table, so a reader always sees a consistent
snapshot and query cost is unchanged by ingest (the 100 TB property:
maintenance is O(batch), reads are O(probed codes)).

Replay contract: ``foreachBatch`` is at-least-once and the codes table
is an append LOG — the producer owns id uniqueness across batches (the
same contract as ``append_version`` and the distinct-matview sink). A
replayed batch re-encodes to the IDENTICAL codes (deterministic encode
given frozen state) but appends duplicate rows; keyed consumers should
read through ``latest_per_key`` or compact with
``compact_ann_index`` after a replay window. The index must already
exist (built by ``build_ann_index`` over the bootstrap corpus) — a
stream cannot train codebooks; that ordering is the point of the
artifact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_append_to_ann_index(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    n_files: int = 1,
    available_now: bool = True,
):
    """``writeStream.foreachBatch`` sink: encode each micro-batch against
    the frozen index state at ``path`` and append its codes in one
    snapshot commit (``append_ann_index``). Raises at start if no index
    exists at ``path``. Returns the started StreamingQuery."""
    from ..sources.ann_index import _load_meta, append_ann_index

    _load_meta(path)  # fail fast: the stream cannot bootstrap an index

    def _ingest(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        append_ann_index(batch.sparkSession, batch, path, n_files=n_files)

    writer = stream.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
