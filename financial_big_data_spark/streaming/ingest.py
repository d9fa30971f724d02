"""Streaming corpus ingest with UNBOUNDED-horizon dedup: corpus-as-state.

``streaming_exact_dedup`` (dedup.py) is watermark-bounded by design — the
engine must evict fingerprint state, so a duplicate re-arriving AFTER the
horizon passes. For corpus building that is the wrong trade: a document
crawled twice a week apart is still a duplicate. The fix is the same
pattern as the upsert sink (upsert.py): move the state INTO the table.

Per micro-batch (``foreachBatch``):

1. quality gate (optional) — the shared map-only Column predicates;
2. within-batch collapse — min-id per normalized-content fingerprint;
3. corpus anti-join — ``incremental_dedup`` (operators/dedup.py): the
   accumulated corpus is read as DISTINCT FINGERPRINTS ONLY (column
   pruning reaches the parquet scan; md5 keys shuffle uniformly);
4. append survivors to the corpus directory.

Replay safety: ``foreachBatch`` is at-least-once, and a plain append sink
would duplicate on replay — but step 3 makes the composition CONVERGENT:
a replayed batch's fingerprints are already in the corpus, so the
anti-join drops every row and the replay appends nothing (pinned by the
fresh-checkpoint replay test). A crashed mid-batch write never commits
partial files (Spark's output committer), so the invariant holds across
failures too.

State cost at 100 TB: zero state store; each batch reads the corpus's
fingerprint COLUMN (a fraction of corpus bytes; at larger scale the
fingerprints live in their own compacted side table via
sources/maintenance.py and the scan is constant-ish per batch).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import normalized_text


def streaming_ingest_dedup(
    stream: DataFrame,
    corpus_path: str,
    checkpoint: str,
    text: str = "text",
    id_col: str = "doc_id",
    quality_gate: bool = False,
    available_now: bool = True,
):
    """Start the ingest query; returns the StreamingQuery.

    With ``quality_gate`` the shared Gopher-style pass_quality predicate
    (operators/quality.py) filters each batch before dedup.
    """

    def _ingest(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        if quality_gate:
            from ..operators.quality import quality_metric_columns

            cols = quality_metric_columns(text)
            batch = batch.where(cols["pass_quality"] == 1)
        fp = batch.withColumn("_fp", F.md5(normalized_text(text)))
        # within-batch: ONE deterministic representative row per
        # fingerprint — min-id, and min over the whole row for exact
        # duplicates sharing both id and fingerprint (a left_semi on
        # (min-id, fp) alone would keep every such copy)
        collapsed = (
            fp.groupBy("_fp")
            .agg(F.min(F.struct(F.col(id_col), *[
                F.col(c) for c in fp.columns if c not in (id_col, "_fp")
            ])).alias("_row"))
            .select(F.col("_fp"), F.col("_row.*"))
        )
        if os.path.exists(corpus_path):
            seen = (
                batch.sparkSession.read.parquet(corpus_path)
                .select(F.md5(normalized_text(text)).alias("_fp"))
                .distinct()
            )
            fresh = collapsed.join(seen, on="_fp", how="left_anti")
        else:
            fresh = collapsed
        fresh.drop("_fp").write.mode("append").parquet(corpus_path)

    writer = stream.writeStream.foreachBatch(_ingest).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
