"""Streaming deduplication + stream-static enrichment (north-star streaming).

Two patterns a continuous ingestion pipeline needs:

- **streaming_exact_dedup**: drop re-delivered payloads by content
  fingerprint within a watermark horizon. State = one fingerprint per kept
  row inside the watermark window — bounded by (arrival rate × horizon),
  evicted by the engine. Exactly the exact-dedup operator
  (operators.dedup.exact_dedup_keys) lifted to streams.
- **enrich_with_dimension**: stream-static broadcast join against a slowly
  changing dimension table — the static side re-resolves per micro-batch,
  so dimension updates are picked up without restarting the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text: str = "text",
    time: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each normalized-content fingerprint within
    the watermark horizon."""
    fingerprinted = stream.withColumn(
        "fp", F.md5(F.lower(F.regexp_replace(F.col(text), r"\s+", " ")))
    )
    return fingerprinted.withWatermark(time, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def enrich_with_dimension(
    stream: DataFrame,
    dimension: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join; the dimension side is broadcast per micro-batch."""
    return stream.join(F.broadcast(dimension), on=on, how=how)
