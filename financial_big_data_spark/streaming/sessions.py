"""Streaming sessionization + watermarked stream-stream join (§2.10 ext).

- **streaming_sessions**: the streaming mirror of the batch sessionization
  operator (queries.q_ev_sessions — gaps-and-islands, gap > N ⇒ new
  session) expressed with ``F.session_window``: the engine merges events
  into dynamic windows that close once no event arrives within the gap,
  and the watermark bounds session state and late data. Identical session
  boundaries to the batch islands formulation (parity-tested), because
  "merge if within gap of the last event" is exactly the island rule.
  Distinct counts use ``approx_count_distinct`` — exact distinct
  aggregation is unsupported in streaming; the batch operator stays exact.

- **stream_stream_join**: watermarked inner join with an event-time range
  predicate. Both sides carry watermarks and the range condition lets the
  engine evict join state (unbounded state otherwise) — the streaming
  analog of the bounded as-of/backward-window join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    stream: DataFrame,
    series: str = "user_id",
    time: str = "ts",
    value: str = "value",
    event_type: str = "event_type",
    gap: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """Per-series session aggregates over dynamic session windows."""
    return (
        stream.withWatermark(time, watermark)
        .groupBy(F.col(series), F.session_window(F.col(time), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col(value).cast("decimal(38,9)")), 6)
            .cast("double")
            .alias("total_value"),
            F.approx_count_distinct(event_type).alias("n_types_approx"),
        )
        .select(
            series,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
            "n_types_approx",
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner stream-stream equi-join where the right event must fall within
    ``horizon`` BEFORE the left event (backward range — enrichment shape).

    The watermarks plus the range predicate make the join state evictable:
    a buffered right row can be dropped once the left watermark passes
    ``right_time + horizon``.
    """
    lw = left.withWatermark(left_time, watermark).alias("l")
    rw = right.withWatermark(right_time, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}"))
        & (
            F.col(f"r.{right_time}")
            >= F.col(f"l.{left_time}") - F.expr(f"INTERVAL {horizon}")
        )
    )
    return lw.join(rw, cond, "inner")
