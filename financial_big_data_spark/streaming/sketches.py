"""Streaming cardinality monitoring: windowed HLL distinct-count estimates.

"How many distinct users per hour?" over an unbounded stream cannot keep
exact per-window distinct sets — state grows with cardinality and the
engine cannot drop a value until the window closes. The HLL register build
(operators/sketches.py) is a plain ``groupBy().max()`` aggregate, so it
lifts onto a watermarked tumbling window directly: state per window is
≤ 2^b register rows REGARDLESS of how many distinct values arrive — the
streaming version of the same mergeable-sketch argument (late rows within
the watermark fold in via max, which is exactly the HLL merge).

The registers stream updates in ``update`` output mode; the estimate is a
stateless projection over them per micro-batch. At 100 TB/day this is the
difference between a dashboard query and an unbounded state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import HASH_BITS, uniform_hash60


def streaming_hll_registers(
    stream: DataFrame,
    value: str,
    time: str = "ts",
    window: str = "1 hour",
    watermark: str = "1 hour",
    b: int = 8,
    by: list[str] | None = None,
    hash: str = "md5",
) -> DataFrame:
    """Watermarked per-window HLL registers:
    (window, *by, bucket, rho). State is bounded at 2^b rows per open
    (window, group) — the engine evicts closed windows past the watermark.

    Mirrors operators.sketches.hll_sketch exactly (same bucket/rho
    derivation), so a batch re-run over the same rows produces identical
    registers — pinned by the batch-parity test.
    """
    if not 4 <= b <= 16:
        raise ValueError("hll bucket bits b must be in [4, 16]")
    by = list(by or [])
    wbits = HASH_BITS - b
    h = uniform_hash60(value, hash=hash)
    bucket = F.shiftright(h, wbits).cast("int")
    rest = h.bitwiseAND(F.lit(2**wbits - 1))
    rho = F.when(rest == 0, F.lit(wbits + 1)).otherwise(
        F.lit(wbits + 1) - F.length(F.conv(rest.cast("string"), 10, 2))
    )
    return (
        stream.withWatermark(time, watermark)
        .select(
            F.col(time),
            *by,
            bucket.alias("bucket"),
            rho.cast("int").alias("rho"),
        )
        .groupBy(F.window(F.col(time), window).alias("win"), *by, "bucket")
        .agg(F.max("rho").alias("rho"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *by,
            "bucket",
            "rho",
        )
    )
