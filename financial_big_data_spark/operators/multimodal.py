"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star surface (BASELINE.json): treat image/audio/video as ``binary``
columns with a typed metadata struct, and run decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages. Decode is
REAL for the library-free formats: PNG pixels (stdlib zlib inflate +
per-scanline unfilter) and WAV PCM samples (struct unpack) via
``operators/media_codecs.py``; formats that genuinely need a media library
(mp4 video) get honest byte-level features, and a real pipeline injects
e.g. an ffmpeg-backed callable with the same ``decoder`` signature.
Everything Spark-side — schema, batching, partitioning, output contract —
is real and tested.

Scale design: mapInPandas streams Arrow batches through the Python worker;
payloads never land on the driver. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — for ~MB media payloads
set it low (e.g. 32) to cap worker memory. Decode is embarrassingly
parallel: parallelism = input partitions, no shuffle anywhere.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from financial_big_data_spark.operators.media_codecs import (
    DECODE_ERRORS,
    decode_png,
    default_decode,
    encode_png,
    encode_wav,
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for plumbing tests. Image rows are REAL
    PNGs and baseline JPEGs (every third image row — 4:2:0 subsampled on
    alternate ones, so the chroma-upsample decode path is in the mix) and
    audio rows REAL 16-bit PCM WAVs (built with the library-free
    encoders, decodable by the real kernels); video rows are seeded opaque
    bytes (no library-free mp4 codec exists — see media_codecs docstring)."""
    from .jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            px = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
            if (i // 3) % 3 == 2:
                payload = encode_jpeg(px, quant=4, subsample=(i // 9) % 2 == 0)
            else:
                # cycle scanline filters so fixtures exercise every unfilter
                # path incl. the wavefront Average/Paeth kernel (decoded
                # pixels are filter-independent; features don't change)
                payload = encode_png(px, filter_type=(i // 3) % 5)
        elif kind == "audio":
            t = np.arange(1600 + (i % 7) * 160) / 16000.0
            payload = encode_wav(
                0.5 * np.sin(2 * np.pi * (220 + 10 * i) * t), sample_rate=16000
            )
        else:
            # a REAL (valid ISO-BMFF) container with junk sample data: the
            # ftyp/moov metadata parses (parse_mp4); the mdat payload is
            # seeded bytes — codec SAMPLE decode stays behind an injected
            # kernel, so features remain honest byte histograms
            from .media_codecs import encode_mp4_stub

            dur = 1000.0 + (i % 7) * 500
            meta = encode_mp4_stub(
                duration_ms=dur,
                tracks=(
                    ("vide", "avc1", dur, 24 + i % 5),
                    ("soun", "mp4a", dur, 43 + i % 5),
                ),
            )
            mdat = rng.integers(0, 256, size=256 + (i % 7) * 64, dtype=np.uint8)
            import struct as _struct

            payload = meta + _struct.pack(">I", len(mdat) + 8) + b"mdat" + mdat.tobytes()
        if kind == "image":
            mime = "image/jpeg" if payload[:3] == b"\xff\xd8\xff" else "image/png"
        else:
            mime = {"audio": "audio/wav", "video": "video/mp4"}[kind]
        rows.append(
            (
                i,
                kind,
                mime,
                bytearray(payload),
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                None if kind == "image" else 1000 + i,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_features(
    media: DataFrame,
    dim: int = 16,
    decoder: Callable[[bytes, str, int], list[float]] | None = None,
) -> DataFrame:
    """Decode/feature-extract each payload → (media_id, kind, n_bytes, features).

    ``decoder`` runs inside mapInPandas per Arrow batch. The default kernel
    (``media_codecs.default_decode``) REALLY decodes PNG pixels and WAV
    samples and falls back to byte-histogram features for other formats;
    the output schema is fixed regardless of decoder, so injecting e.g. an
    ffmpeg-backed kernel is a pure function change.
    """
    decode = decoder or default_decode
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode(bytes(p), k, dim) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": pdf["payload"].map(len).astype("int64").values,
                    "features": feats,
                }
            )

    return media.mapInPandas(fn, out_schema)


def extract_container_metadata(media: DataFrame) -> DataFrame:
    """ISO-BMFF (MP4/MOV) CONTAINER metadata per payload → (media_id,
    brand, container_duration_ms, n_tracks, codecs array<string>,
    track_kinds array<string>) — the honest metadata level for video:
    box-walk parsing (media_codecs.parse_mp4) is library-free and runs
    Arrow-batched in mapInPandas; sample decode stays behind injected
    kernels. Non-BMFF payloads yield null metadata (same quarantine
    contract as the decode stage — corpus routing/filtering by
    duration/codec needs the parseable subset, not an exception)."""
    from .media_codecs import DECODE_ERRORS, parse_mp4

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("brand", T.StringType()),
            T.StructField("container_duration_ms", T.DoubleType()),
            T.StructField("n_tracks", T.IntegerType()),
            T.StructField("codecs", T.ArrayType(T.StringType())),
            T.StructField("track_kinds", T.ArrayType(T.StringType())),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    m = parse_mp4(bytes(payload))
                    recs.append(
                        (
                            mid,
                            m["brand"],
                            m["duration_ms"],
                            len(m["tracks"]),
                            [t["codec"] for t in m["tracks"]],
                            [t["kind"] for t in m["tracks"]],
                        )
                    )
                except DECODE_ERRORS:
                    recs.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "brand", "container_duration_ms",
                    "n_tracks", "codecs", "track_kinds",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(fn, out_schema)


def frame_sample(
    media: DataFrame,
    every_ms: int = 500,
    sampler: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (media_id,
    frame_idx, frame_ts_ms, frame_payload). Stub sampler slices the payload
    deterministically; a real one decodes with ffmpeg."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("frame_payload", T.BinaryType()),
        ]
    )

    def default_sampler(payload: bytes, n_frames: int) -> list[bytes]:
        step = max(len(payload) // max(n_frames, 1), 1)
        return [payload[i * step : (i + 1) * step] for i in range(n_frames)]

    sample = sampler or default_sampler

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, payloads = [], [], [], []
            for _, row in pdf.iterrows():
                # nullable longs arrive from Arrow as NaN floats, not None
                if row["kind"] != "video" or pd.isna(row["duration_ms"]):
                    continue
                n_frames = max(int(row["duration_ms"] // every_ms), 1)
                for j, frame in enumerate(sample(bytes(row["payload"]), n_frames)):
                    ids.append(row["media_id"])
                    idxs.append(j)
                    tss.append(j * every_ms)
                    payloads.append(frame)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_ts_ms": pd.array(tss, dtype="int64"),
                    "frame_payload": payloads,
                }
            )

    return media.where(F.col("kind") == "video").mapInPandas(fn, out_schema)


def resize_images(
    media: DataFrame, width: int, height: int, payload: str = "payload"
) -> DataFrame:
    """REAL image resize: decode PNG → nearest-neighbor resample →
    re-encode PNG, per Arrow batch inside mapInPandas (map-only, no
    shuffle; payloads never touch the driver).

    Output: (media_id, width, height, payload) with the resized PNG.
    Non-PNG / undecodable payloads are dropped (a real pipeline would
    route them to a quarantine sink).
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for mid, p in zip(pdf["media_id"], pdf[payload]):
                try:
                    px = decode_png(bytes(p))
                except DECODE_ERRORS:  # any parse failure → quarantine (drop)
                    continue
                h0, w0 = px.shape[:2]
                ys = np.minimum((np.arange(height) * h0) // height, h0 - 1)
                xs = np.minimum((np.arange(width) * w0) // width, w0 - 1)
                ids.append(mid)
                payloads.append(encode_png(px[ys][:, xs]))
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="int64"),
                    "width": pd.array([width] * len(ids), dtype="int32"),
                    "height": pd.array([height] * len(ids), dtype="int32"),
                    "payload": payloads,
                }
            )

    return media.mapInPandas(fn, out_schema)


# ---------------------------------------------------------------------------
# Real container-header parsing — JVM Column expressions, no media libraries
# ---------------------------------------------------------------------------

PNG_MAGIC_HEX = "89504E470D0A1A0A"


def _be32(payload: F.Column, pos: int) -> F.Column:
    """Big-endian uint32 at 1-indexed byte offset ``pos`` of a binary col."""
    return F.conv(F.hex(F.substring(payload, pos, 4)), 16, 10).cast("long")


def _le32(payload: F.Column, pos: int) -> F.Column:
    """Little-endian uint32 at 1-indexed byte offset ``pos``."""
    return sum(
        F.conv(F.hex(F.substring(payload, pos + i, 1)), 16, 10).cast("long")
        * (256 ** i)
        for i in range(4)
    )


def _le16(payload: F.Column, pos: int) -> F.Column:
    return sum(
        F.conv(F.hex(F.substring(payload, pos + i, 1)), 16, 10).cast("long")
        * (256 ** i)
        for i in range(2)
    )


def parse_media_headers(
    df: DataFrame, payload: str = "payload", prefix: str = "hdr_"
) -> DataFrame:
    """REAL (library-free) metadata decode of the two self-describing
    container formats: PNG IHDR and canonical RIFF/WAVE headers, parsed as
    pure JVM Column expressions over the binary payload — map-only,
    whole-stage-codegen'd, no Python worker, scales with the scan.

    - PNG (magic ``89 50 4E 47 0D 0A 1A 0A``): width/height are big-endian
      uint32 at byte offsets 17/21 (IHDR is always the first chunk).
    - canonical WAV (``RIFF….WAVE fmt ``): channels (LE16 @23),
      sample_rate (LE32 @25), bits_per_sample (LE16 @35), data-chunk size
      (LE32 @41 when the data chunk follows fmt directly) → duration_ms.

    Non-matching payloads yield NULLs — this is the honest metadata level
    of the decode stack; pixel/sample decode stays behind the injected
    ``decoder`` kernels (no media libs in this environment).
    """
    p = F.col(payload)
    is_png = F.hex(F.substring(p, 1, 8)) == F.lit(PNG_MAGIC_HEX)
    is_wav = (
        (F.substring(p, 1, 4).cast("string") == "RIFF")
        & (F.substring(p, 9, 4).cast("string") == "WAVE")
        & (F.substring(p, 13, 4).cast("string") == "fmt ")
    )
    sample_rate = _le32(p, 25)
    channels = _le16(p, 23)
    bits = _le16(p, 35)
    data_bytes = _le32(p, 41)
    bytes_per_sec = sample_rate * channels * (bits / F.lit(8.0))
    duration_ms = F.round(
        F.try_divide(data_bytes * 1000.0, bytes_per_sec)
    ).cast("long")
    return (
        df.withColumn(
            f"{prefix}format",
            F.when(is_png, "png").when(is_wav, "wav").otherwise(F.lit(None)),
        )
        .withColumn(f"{prefix}width", F.when(is_png, _be32(p, 17)).cast("int"))
        .withColumn(f"{prefix}height", F.when(is_png, _be32(p, 21)).cast("int"))
        .withColumn(f"{prefix}channels", F.when(is_wav, channels).cast("int"))
        .withColumn(f"{prefix}sample_rate", F.when(is_wav, sample_rate).cast("int"))
        .withColumn(f"{prefix}duration_ms", F.when(is_wav, duration_ms))
    )
