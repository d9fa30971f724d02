"""Streaming corpus curation: the continuous-ingest front door.

Composes the batch curation DAG's first two stages onto a stream:

1. **Quality gate** — the Gopher-style repetition/length flags
   (operators/quality.py ``quality_metric_columns``) are pure Column
   expressions, so they apply map-only per micro-batch with zero state.
2. **Watermarked exact dedup** — first-arrival-wins by normalized-content
   fingerprint within the watermark horizon (streaming/dedup.py);
   state is one fingerprint per kept row inside the horizon, evicted by
   the engine.

Everything downstream of the watermark horizon (LSH near-dup,
decontamination, packing) is batch-shaped work over the accepted corpus —
a real pipeline runs this gate continuously and the heavy batch stages
periodically over the accumulated output (the incremental_dedup operator
bridges the two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.quality import quality_metric_columns
from .dedup import streaming_exact_dedup


def streaming_curation(
    stream: DataFrame,
    text: str = "text",
    time: str = "ts",
    watermark: str = "1 hour",
    keep_metrics: bool = False,
) -> DataFrame:
    """Quality-gate then dedup a document stream; returns the accepted
    rows (first arrival of each passing fingerprint). With
    ``keep_metrics`` the quality columns ride along for auditing."""
    cols = quality_metric_columns(text)
    gated = stream.select(
        "*", *[c.alias(name) for name, c in cols.items()]
    ).where(F.col("pass_quality") == 1)
    if not keep_metrics:
        gated = gated.drop(*cols.keys())
    return streaming_exact_dedup(gated, text=text, time=time, watermark=watermark)
