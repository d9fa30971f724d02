"""Library-free baseline JPEG codec: round-trip accuracy, subsampling,
restart markers, hand-assembled T.81 stream decode (encoder-independent),
refusal of non-baseline variants, and the default_decode routing."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from financial_big_data_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _rng():
    return np.random.default_rng(0)


def test_gray_lossless_roundtrip():
    g = (np.arange(24)[:, None] * 5 + np.arange(40)[None, :] * 3).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quant=1))
    assert out.shape == g.shape
    assert np.array_equal(out, g)  # all-ones quant: FDCT/IDCT exact here


def test_rgb_near_lossless_roundtrip():
    rgb = _rng().integers(0, 255, size=(17, 23, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quant=1))
    assert out.shape == rgb.shape
    # color-space round-trip + DCT float rounding: within ±2 per sample
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2


def _smooth_rgb(h=33, w=47):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (128 + 60 * np.sin(yy / 9)).astype(np.uint8),
            (128 + 60 * np.cos(xx / 11)).astype(np.uint8),
            (128 + 30 * np.sin((xx + yy) / 15)).astype(np.uint8),
        ],
        axis=-1,
    )


def test_420_subsampling_roundtrip():
    sm = _smooth_rgb()
    out = decode_jpeg(encode_jpeg(sm, quant=1, subsample=True))
    assert out.shape == sm.shape
    # chroma is box-averaged 2x2 then nearest-upsampled: smooth content
    # stays close; this pins the MCU interleave + upsample geometry
    assert np.abs(out.astype(int) - sm.astype(int)).mean() < 2.5


def test_restart_markers_roundtrip():
    rgb = _rng().integers(0, 255, size=(17, 23, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quant=1, restart_interval=2))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2
    # restart + subsampling compose
    sm = _smooth_rgb()
    both = decode_jpeg(encode_jpeg(sm, quant=1, subsample=True, restart_interval=1))
    plain = decode_jpeg(encode_jpeg(sm, quant=1, subsample=True))
    assert np.array_equal(both, plain)  # RSTs change framing, not pixels


def test_quantization_degrades_gracefully():
    sm = _smooth_rgb(64, 64)[..., 0]  # smooth grayscale
    out = decode_jpeg(encode_jpeg(sm, quant=8))
    assert np.abs(out.astype(int) - sm.astype(int)).mean() < 3.0


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _handmade_gray_block() -> bytes:
    """8x8 constant-130 grayscale, assembled byte-by-byte per T.81 —
    NOT produced by encode_jpeg, so it pins the decoder independently:
    DC table maps code 00->category 5, AC table code 00->EOB; stream is
    DC 00 + amplitude 10000 (=16 -> DC coef 16 -> pixel 130), EOB."""
    q = bytes([0x00]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00] + [0, 1] + [0] * 14) + bytes([5])
    dht_ac = bytes([0x10] + [0, 1] + [0] * 14) + bytes([0])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    entropy = bytes([0b00100000, 0b01111111])
    return (
        b"\xff\xd8" + _seg(0xDB, q) + _seg(0xC0, sof) + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac) + _seg(0xDA, sos) + entropy + b"\xff\xd9"
    )


def test_decodes_hand_assembled_stream():
    img = decode_jpeg(_handmade_gray_block())
    assert img.shape == (8, 8)
    assert (img == 130).all()


def test_gray_with_declared_2x2_factors_decodes_as_noninterleaved():
    """T.81 A.2.2: a single-component scan is non-interleaved regardless
    of declared sampling factors — a gray JPEG whose SOF says 2x2 must
    decode identically to the 1x1 one, not walk a 16x16-MCU geometry
    (ADVICE r5: the interleaved walk mis-ordered blocks or died in
    bit-pad)."""
    g = (np.arange(24)[:, None] * 5 + np.arange(40)[None, :] * 3).astype(np.uint8)
    good = encode_jpeg(g, quant=1)
    i = good.index(b"\xff\xc0")
    # SOF0 layout: marker(2) len(2) prec(1) h(2) w(2) nc(1) cid(1) hv(1)
    assert good[i + 11] == 0x11
    patched = good[: i + 11] + bytes([0x22]) + good[i + 12:]
    assert np.array_equal(decode_jpeg(patched), g)


def test_rejects_non_baseline():
    good = encode_jpeg(np.zeros((8, 8), dtype=np.uint8))
    # flip SOF0 (FFC0) to SOF3 (FFC3, lossless) — still unsupported
    lossless = good.replace(b"\xff\xc0", b"\xff\xc3", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(lossless)
    # a baseline stream RELABELED SOF2 is malformed as progressive (its
    # single scan says Ss=0, Se=63 — a progressive DC scan must have
    # Se=0): refused, never mis-decoded
    relabeled = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(relabeled)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_corrupt_payload_raises_decode_errors_only():
    from financial_big_data_spark.operators.media_codecs import DECODE_ERRORS

    good = bytearray(encode_jpeg(_smooth_rgb(16, 16), quant=2))
    for cut in (10, len(good) // 2, len(good) - 3):
        trunc = bytes(good[:cut])
        try:
            decode_jpeg(trunc)
        except DECODE_ERRORS:
            pass  # any parse failure must be in the quarantine tuple
    # bit flips in the entropy stream
    for flip in range(len(good) - 20, len(good) - 2):
        bad = bytearray(good)
        bad[flip] ^= 0x5A
        try:
            decode_jpeg(bytes(bad))
        except DECODE_ERRORS:
            pass


def test_default_decode_routes_jpeg():
    from financial_big_data_spark.operators.media_codecs import (
        byte_features,
        default_decode,
        png_features,
    )

    sm = _smooth_rgb(16, 16)
    payload = encode_jpeg(sm, quant=1)
    feats = default_decode(payload, "image", 8)
    want = png_features(decode_jpeg(payload), 8)
    assert feats == want                      # real pixel features
    assert feats != byte_features(payload, 8)  # not the fallback
    # corrupt jpeg-magic payload falls back to byte features
    bad = payload[:40]
    assert default_decode(bad, "image", 8) == byte_features(bad, 8)


def test_synthetic_media_contains_decodable_jpegs(spark):
    from financial_big_data_spark.operators.multimodal import synthetic_media

    rows = synthetic_media(spark, n=30).collect()
    jpegs = [r for r in rows if r.mime == "image/jpeg"]
    assert jpegs, "expected jpeg rows in the fixture mix"
    for r in jpegs:
        img = decode_jpeg(bytes(r.payload))
        assert img.shape == (48, 64, 3)


def test_zero_length_segment_raises_not_hangs():
    """A corrupt APP0 with segment length 0 must raise (ValueError),
    never spin the marker loop forever (code-review r5 finding)."""
    bad = b"\xff\xd8\xff\xe0\x00\x00" + b"\x00" * 32
    with pytest.raises(ValueError, match="segment length"):
        decode_jpeg(bad)


def test_undefined_tables_raise_value_error_not_keyerror():
    """SOS referencing undefined Huffman/quant tables must raise inside
    DECODE_ERRORS (ValueError), not a bare KeyError that would escape
    default_decode's quarantine (code-review r5 finding)."""
    good = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8)))
    # flip the SOS component's huffman selector from table 0 to table 7
    sos_at = bytes(good).find(b"\xff\xda")
    assert sos_at > 0
    patched = bytearray(good)
    patched[sos_at + 6] = 0x77  # td=7, ta=7 (never defined)
    with pytest.raises(ValueError, match="huffman table"):
        decode_jpeg(bytes(patched))
    patched2 = bytearray(good)
    # flip SOF0 component's quant-table selector to 3 (never defined)
    sof_at = bytes(good).find(b"\xff\xc0")
    patched2[sof_at + 12] = 3  # comp tq byte inside SOF0
    with pytest.raises(ValueError, match="quant table"):
        decode_jpeg(bytes(patched2))


# ---------------------------------------------------------------------------
# Progressive (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_gray_matches_baseline_decode():
    """Progressive round-trip: successive-approximation scans (DC first
    Al=1 + refine, AC first Al=1 + refine) reassemble the exact
    coefficients, so the decode matches the baseline decode of the same
    pixels bit-for-bit at quant=1."""
    from financial_big_data_spark.operators.jpeg import encode_jpeg_progressive

    g = (np.arange(24)[:, None] * 5 + np.arange(40)[None, :] * 3).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(g, quant=1))
    prog = decode_jpeg(encode_jpeg_progressive(g, quant=1, al=1))
    assert prog.shape == base.shape
    assert np.array_equal(prog, base)
    assert np.array_equal(prog, g)  # all-ones quant: exact here


def test_progressive_color_roundtrip():
    from financial_big_data_spark.operators.jpeg import encode_jpeg_progressive

    rgb = _rng().integers(0, 255, size=(17, 23, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_progressive(rgb, quant=1, al=1))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2


def test_progressive_spectral_selection_only():
    """al=0: no successive approximation — pure spectral selection (DC
    scan + per-component AC band scans), the other half of G.1.2."""
    from financial_big_data_spark.operators.jpeg import encode_jpeg_progressive

    rgb = _smooth_rgb(16, 16)
    base = decode_jpeg(encode_jpeg(rgb, quant=2))
    prog = decode_jpeg(encode_jpeg_progressive(rgb, quant=2, al=0))
    assert np.array_equal(prog, base)


def test_progressive_quantized():
    from financial_big_data_spark.operators.jpeg import encode_jpeg_progressive

    sm = _smooth_rgb(33, 47)
    out = decode_jpeg(encode_jpeg_progressive(sm, quant=4, al=2))
    base = decode_jpeg(encode_jpeg(sm, quant=4))
    # same quantized coefficients -> identical reconstruction
    assert np.array_equal(out, base)


def test_decodes_hand_assembled_progressive_stream():
    """Encoder-independent pin: 8x8 gray assembled byte-by-byte as THREE
    progressive scans — DC first (Al=1, value 8 -> coef 16), DC refine
    (bit 0), AC first (EOB only). DC table: code '0' -> category 4; AC
    table: code '0' -> EOB. Expected: constant 130 (16/8 + 128)."""
    q = bytes([0x00]) + bytes([1] * 64)
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00] + [1] + [0] * 15) + bytes([4])
    dht_ac = bytes([0x10] + [1] + [0] * 15) + bytes([0x00])
    scan1 = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01])) + bytes([0b01000111])
    scan2 = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + bytes([0b01111111])
    scan3 = _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00])) + bytes([0b01111111])
    payload = (
        b"\xff\xd8" + _seg(0xDB, q) + _seg(0xC2, sof) + _seg(0xC4, dht_dc)
        + _seg(0xC4, dht_ac) + scan1 + scan2 + scan3 + b"\xff\xd9"
    )
    img = decode_jpeg(payload)
    assert img.shape == (8, 8)
    assert (img == 130).all()


def test_default_decode_routes_progressive():
    """SOF2 no longer falls back to byte features — the decoded-pixel
    feature path handles progressive payloads (VERDICT r5 #7)."""
    from financial_big_data_spark.operators.jpeg import encode_jpeg_progressive
    from financial_big_data_spark.operators.media_codecs import default_decode

    sm = _smooth_rgb(16, 16)
    f_prog = default_decode(encode_jpeg_progressive(sm, quant=1, al=1), "image", 8)
    f_base = default_decode(encode_jpeg(sm, quant=1), "image", 8)
    assert f_prog == pytest.approx(f_base, abs=1e-9)


def test_progressive_corrupt_payload_raises_decode_errors_only():
    from financial_big_data_spark.operators.jpeg import encode_jpeg_progressive
    from financial_big_data_spark.operators.media_codecs import DECODE_ERRORS

    good = bytearray(encode_jpeg_progressive(_smooth_rgb(16, 16), quant=2, al=1))
    for cut in (12, len(good) // 3, len(good) // 2, len(good) - 3):
        try:
            decode_jpeg(bytes(good[:cut]))
        except DECODE_ERRORS:
            pass
    for flip in range(len(good) - 40, len(good) - 2, 3):
        bad = bytearray(good)
        bad[flip] ^= 0x5A
        try:
            decode_jpeg(bytes(bad))
        except DECODE_ERRORS:
            pass
