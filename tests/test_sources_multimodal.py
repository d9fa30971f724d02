"""REST source scaffolding + multimodal plumbing tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from financial_big_data_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synthetic_media,
)
from financial_big_data_spark.sources.rest import fetch_ohlcv, top_symbols, write_bars

HOUR_MS = 3_600_000


def _fake_exchange(n_bars=2500):
    """Deterministic in-memory exchange: hourly bars from epoch 0."""

    def fetch_page(symbol, since_ms, limit):
        start_idx = max((since_ms + HOUR_MS - 1) // HOUR_MS, 0)
        base = float(abs(hash(symbol)) % 100 + 1)
        out = []
        for i in range(start_idx, min(start_idx + limit, n_bars)):
            px = base + (i % 50) * 0.1
            out.append([i * HOUR_MS, px, px * 1.01, px * 0.99, px + 0.05, 1000.0 + i])
        return out

    return fetch_page


def test_fetch_ohlcv_pagination(spark):
    symbols = spark.createDataFrame([("AAA/USDT",), ("BBB/USDT",)], "symbol string")
    end = 2499 * HOUR_MS
    bars = fetch_ohlcv(symbols, _fake_exchange(), start_ms=0, end_ms=end, page_limit=1000)
    counts = {r.symbol: r["count"] for r in bars.groupBy("symbol").count().collect()}
    assert counts == {"AAA/USDT": 2500, "BBB/USDT": 2500}  # 3 pages stitched
    # cursor never duplicates and stays ordered
    one = bars.where("symbol='AAA/USDT'")
    assert one.select("ts").distinct().count() == 2500


def test_fetch_ohlcv_respects_end(spark):
    symbols = spark.createDataFrame([("AAA/USDT",)], "symbol string")
    bars = fetch_ohlcv(symbols, _fake_exchange(), start_ms=0, end_ms=99 * HOUR_MS)
    assert bars.count() == 100


def test_fetch_ohlcv_retries(spark):
    calls = {"n": 0}
    inner = _fake_exchange()

    def flaky(symbol, since, limit):
        calls["n"] += 1
        if calls["n"] % 3 == 1:
            raise ConnectionError("transient")
        return inner(symbol, since, limit)

    symbols = spark.createDataFrame([("AAA/USDT",)], "symbol string")
    bars = fetch_ohlcv(
        symbols, flaky, start_ms=0, end_ms=99 * HOUR_MS, max_retries=3, backoff_s=0.0
    )
    assert bars.count() == 100


def test_top_symbols(spark):
    rows = [
        ("AAA/USDT", 100.0),
        ("BBB/USDT", 300.0),
        ("CCC/BTC", 999.0),  # filtered by suffix
        ("DDD/USDT", 200.0),
    ]
    t = spark.createDataFrame(rows, "symbol string, quote_volume double")
    got = [r.symbol for r in top_symbols(t, n=2).collect()]
    assert got == ["BBB/USDT", "DDD/USDT"]


def test_write_bars_partition_pruning(spark, tmp_path):
    symbols = spark.createDataFrame([("AAA/USDT",), ("BBB/USDT",)], "symbol string")
    bars = fetch_ohlcv(symbols, _fake_exchange(), start_ms=0, end_ms=49 * HOUR_MS)
    path = str(tmp_path / "bars")
    write_bars(bars, path)
    rd = spark.read.parquet(path).where(F.col("symbol") == "AAA/USDT")
    assert rd.count() == 50
    # partition pruning reaches the scan: symbol is a PartitionFilter
    plan = rd._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "symbol" in plan.split("PartitionFilters")[1][:200]


def test_media_features_deterministic(spark):
    media = synthetic_media(spark, n=30)
    out = extract_features(media, dim=8)
    rows = out.collect()
    assert len(rows) == 30
    assert all(len(r.features) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r.features)
    again = {r.media_id: r.features for r in extract_features(media, dim=8).collect()}
    for r in rows:
        assert again[r.media_id] == r.features  # decode is deterministic


def test_media_custom_decoder_injection(spark):
    media = synthetic_media(spark, n=9)
    out = extract_features(media, dim=2, decoder=lambda p, k, d: [float(len(p)), 0.0])
    rows = {r.media_id: r for r in out.collect()}
    assert all(r.features[0] == r.n_bytes for r in rows.values())


def test_frame_sample(spark):
    media = synthetic_media(spark, n=30)
    frames = frame_sample(media, every_ms=500)
    per_media = {r.media_id: r["count"] for r in frames.groupBy("media_id").count().collect()}
    durations = {
        r.media_id: r.duration_ms for r in media.where("kind='video'").collect()
    }
    assert set(per_media) == set(durations)
    for mid, n in per_media.items():
        assert n == max(durations[mid] // 500, 1)
    row = frames.limit(1).collect()[0]
    assert isinstance(row.frame_payload, (bytes, bytearray))


def test_parse_media_headers_real_formats(spark):
    """JVM-side container-header decode: real PNG IHDR and canonical WAV
    headers parse without any media library; junk payloads yield NULLs."""
    import struct
    import zlib

    from financial_big_data_spark.operators.multimodal import parse_media_headers

    def png_bytes(w, h):
        sig = bytes.fromhex("89504E470D0A1A0A")
        ihdr_data = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            sig + struct.pack(">I", 13) + b"IHDR" + ihdr_data
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr_data))
        )

    def wav_bytes(rate, ch, bits, n_samples):
        data_size = n_samples * ch * bits // 8
        fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
        return (
            b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", data_size) + b"\0" * min(data_size, 64)
        )

    rows = [
        (1, bytearray(png_bytes(640, 480))),
        (2, bytearray(png_bytes(1, 99999))),
        (3, bytearray(wav_bytes(44100, 2, 16, 44100 * 3))),
        (4, bytearray(wav_bytes(16000, 1, 8, 8000))),
        (5, bytearray(b"garbage data here, not a container")),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r.media_id: r for r in parse_media_headers(df).collect()}
    assert (got[1].hdr_format, got[1].hdr_width, got[1].hdr_height) == ("png", 640, 480)
    assert (got[2].hdr_width, got[2].hdr_height) == (1, 99999)
    assert (got[3].hdr_format, got[3].hdr_channels, got[3].hdr_sample_rate) == ("wav", 2, 44100)
    assert got[3].hdr_duration_ms == 3000
    assert (got[4].hdr_sample_rate, got[4].hdr_duration_ms) == (16000, 500)
    assert got[5].hdr_format is None and got[5].hdr_width is None
    assert got[5].hdr_duration_ms is None
