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


def test_png_decode_roundtrip_known_pixels():
    """encode → decode recovers the exact pixel array (RGB, gray, RGBA)."""
    from financial_big_data_spark.operators.media_codecs import decode_png, encode_png

    rng = np.random.default_rng(7)
    for shape in [(5, 4, 3), (3, 7, 1), (6, 2, 4), (4, 4, 2)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        got = decode_png(encode_png(px))
        assert got.shape == shape
        assert np.array_equal(got, px)


def test_png_decode_all_filter_types():
    """Hand-filtered IDAT streams (Sub/Up/Average/Paeth) decode back to the
    known pixels — the unfilter path, not just the encoder's filter-0."""
    import struct
    import zlib

    from financial_big_data_spark.operators.media_codecs import (
        PNG_MAGIC,
        decode_png,
    )

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    rng = np.random.default_rng(11)
    h, w, c = 5, 6, 3
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8).astype(np.int64)
    stride = w * c
    flat = px.reshape(h, stride)
    # forward-filter each scanline with its row's filter type (spec §6)
    raw = bytearray()
    for y in range(h):
        ftype = [0, 1, 2, 3, 4][y % 5]
        raw.append(ftype)
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        for i in range(stride):
            x = int(flat[y][i])
            left = int(flat[y][i - c]) if i >= c else 0
            up = int(prev[i])
            upleft = int(prev[i - c]) if i >= c else 0
            pred = {
                0: 0,
                1: left,
                2: up,
                3: (left + up) >> 1,
                4: paeth(left, up, upleft),
            }[ftype]
            raw.append((x - pred) & 0xFF)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), px.astype(np.uint8).reshape(h, w, c))


def test_png_encoder_filter_types_roundtrip():
    """encode_png(filter_type=…) → decode recovers exact pixels for every
    filter, per-row mixes, every channel count, and degenerate shapes —
    pins the wavefront unfilter against ground-truth pixels (not against
    another decoder implementation)."""
    from financial_big_data_spark.operators.media_codecs import decode_png, encode_png

    rng = np.random.default_rng(3)
    for c in (1, 2, 3, 4):
        for ft in (0, 1, 2, 3, 4):
            px = rng.integers(0, 256, size=(23, 17, c), dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(px, filter_type=ft)), px)
        mixed = rng.integers(0, 5, size=23)
        px = rng.integers(0, 256, size=(23, 17, c), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(px, filter_type=mixed)), px)
    for shape in ((1, 1, 1), (1, 50, 3), (50, 1, 3), (2, 2, 4)):
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in (3, 4):
            assert np.array_equal(decode_png(encode_png(px, filter_type=ft)), px)


def test_default_decode_corrupt_payloads_fall_back():
    """Corrupt payloads that pass the magic check must yield byte features,
    not raise (ADVICE r3: zlib.error/struct.error escaped the ValueError
    catch and failed the whole mapInPandas task)."""
    from financial_big_data_spark.operators.media_codecs import (
        default_decode,
        encode_png,
        encode_wav,
    )

    rng = np.random.default_rng(5)
    png = bytearray(encode_png(rng.integers(0, 256, (16, 16, 3), dtype=np.uint8),
                               filter_type=4))
    png[60] ^= 0xFF  # corrupt IDAT → zlib.error
    png[61] ^= 0xFF
    wav = encode_wav(np.zeros(100))[:30]  # truncated fmt → struct/ValueError
    good_png = encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    for payload in (bytes(png), good_png[:40], good_png[:20], wav):
        feats = default_decode(bytes(payload), "image", 8)
        assert len(feats) == 8
        assert all(isinstance(v, float) for v in feats)


def test_resize_images_corrupt_payload_skipped(spark):
    """A corrupt PNG (bad IDAT → zlib.error) is quarantined by resize_images
    instead of failing the Arrow batch."""
    from financial_big_data_spark.operators.media_codecs import encode_png
    from financial_big_data_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    rng = np.random.default_rng(9)
    good = encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    bad = bytearray(good)
    bad[60] ^= 0xFF
    bad[61] ^= 0xFF
    rows = [
        (0, "image", "image/png", bytearray(good), 8, 8, None),
        (1, "image", "image/png", bad, 8, 8, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(media, width=4, height=4).collect()
    assert [r.media_id for r in out] == [0]


def test_png_decode_palette():
    import struct
    import zlib

    from financial_big_data_spark.operators.media_codecs import PNG_MAGIC, decode_png

    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(payload), palette[idx])


def test_wav_decode_known_samples():
    """16-bit round-trip is sample-exact; 8/24-bit int and float32 decode to
    the expected normalized values; extra RIFF chunks before data are walked."""
    import struct

    from financial_big_data_spark.operators.media_codecs import decode_wav, encode_wav

    x = np.array([[0.0, 0.5], [-0.5, 0.25], [1.0, -1.0]])
    got, rate = decode_wav(encode_wav(x, sample_rate=8000))
    assert rate == 8000 and got.shape == (3, 2)
    assert np.allclose(got, np.clip(x, -32768 / 32767, 1.0), atol=1.5 / 32767)

    # 8-bit unsigned PCM: 128 → 0.0, 255 → ~1.0, 0 → -1.0
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt8
        + b"LIST" + struct.pack("<I", 4) + b"INFO"  # extra chunk must be skipped
        + b"data" + struct.pack("<I", 3) + bytes([0, 128, 255])
    )
    wav8 = b"RIFF" + struct.pack("<I", len(body)) + body
    got8, _ = decode_wav(wav8)
    assert np.allclose(got8[:, 0], [-1.0, 0.0, 127 / 128])

    # float32
    fmtf = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    samples = np.array([0.25, -0.75], dtype="<f4").tobytes()
    bodyf = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmtf
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    gotf, _ = decode_wav(b"RIFF" + struct.pack("<I", len(bodyf)) + bodyf)
    assert np.allclose(gotf[:, 0], [0.25, -0.75])

    # 24-bit: max positive value
    fmt24 = struct.pack("<HHIIHH", 1, 1, 8000, 24000, 3, 24)
    body24 = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt24
        + b"data" + struct.pack("<I", 6) + bytes([255, 255, 127, 0, 0, 128])
    )
    got24, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body24)) + body24)
    assert np.allclose(got24[:, 0], [(2**23 - 1) / 2**23, -1.0])


def test_extract_features_real_decode(spark):
    """The default decoder derives features from REAL decoded content: a
    constant-color PNG must yield its exact channel means, and a silent WAV
    zero RMS — values a byte-hash stub could never produce."""
    from financial_big_data_spark.operators.media_codecs import encode_png, encode_wav

    const_px = np.zeros((8, 8, 3), dtype=np.uint8)
    const_px[:, :, 0] = 255  # pure red
    rows = [
        (0, "image", "image/png", bytearray(encode_png(const_px)), 8, 8, None),
        (1, "audio", "audio/wav", bytearray(encode_wav(np.zeros(800))), None, None, 50),
    ]
    from financial_big_data_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r.features for r in extract_features(media, dim=8).collect()}
    # png_features: [mean_r, std_r, mean_g, std_g, mean_b, std_b, hist...]
    assert feats[0][0] == 1.0 and feats[0][1] == 0.0  # red channel: mean 1, std 0
    assert feats[0][2] == 0.0 and feats[0][4] == 0.0  # green/blue mean 0
    # wav_features: [rms, zcr, ...] — silence is all zeros
    assert feats[1][0] == 0.0 and feats[1][1] == 0.0


def test_resize_images(spark):
    """Nearest-neighbor resize of a 2x2 checkerboard to 4x4 keeps exact
    quadrant colors (decode → resample → re-encode, all inside the task)."""
    from financial_big_data_spark.operators.media_codecs import decode_png, encode_png
    from financial_big_data_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_images,
    )

    board = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    rows = [
        (0, "image", "image/png", bytearray(encode_png(board)), 2, 2, None),
        (1, "video", "video/mp4", bytearray(b"not png"), None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = resize_images(media, width=4, height=4).collect()
    assert len(out) == 1 and out[0].media_id == 0  # non-PNG dropped
    px = decode_png(bytes(out[0].payload))
    assert px.shape == (4, 4, 3)
    expected = board[np.minimum(np.arange(4) * 2 // 4, 1)][
        :, np.minimum(np.arange(4) * 2 // 4, 1)
    ]
    assert np.array_equal(px, expected)


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


def test_parse_mp4_roundtrip_and_validation():
    """BMFF box-walk: the stub fixture parses exactly; truncation and
    junk raise within DECODE_ERRORS (quarantine contract)."""
    import pytest as _pt

    from financial_big_data_spark.operators.media_codecs import (
        DECODE_ERRORS,
        encode_mp4_stub,
        parse_mp4,
    )

    p = encode_mp4_stub(
        brand="mp42", duration_ms=3500.0,
        tracks=(("vide", "hvc1", 3500.0, 84), ("soun", "opus", 3400.0, 150)),
    )
    m = parse_mp4(p)
    assert m["brand"] == "mp42" and m["duration_ms"] == 3500.0
    assert [t["codec"] for t in m["tracks"]] == ["hvc1", "opus"]
    assert [t["kind"] for t in m["tracks"]] == ["video", "audio"]
    assert [t["n_samples"] for t in m["tracks"]] == [84, 150]
    assert m["tracks"][1]["duration_ms"] == 3400.0
    for bad in (b"", b"\x00" * 12, p[:20], b"A" * 64):
        with _pt.raises(DECODE_ERRORS):
            parse_mp4(bad)


def test_extract_container_metadata(spark):
    """Video rows in the synthetic fixture now carry REAL BMFF metadata;
    image/audio rows yield nulls (not exceptions)."""
    from financial_big_data_spark.operators.multimodal import (
        extract_container_metadata,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    out = {r.media_id: r for r in extract_container_metadata(media).collect()}
    assert len(out) == 12
    vids = [r for r in media.collect() if r.kind == "video"]
    assert vids
    for v in vids:
        m = out[v.media_id]
        assert m.brand == "isom"
        assert m.n_tracks == 2 and m.codecs == ["avc1", "mp4a"]
        assert m.container_duration_ms and m.container_duration_ms >= 1000.0
    for r in media.collect():
        if r.kind != "video":
            assert out[r.media_id].brand is None
