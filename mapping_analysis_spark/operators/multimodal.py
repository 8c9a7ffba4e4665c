"""Multimodal (image/audio/video) column handling for training-data pipelines.

Design: media payloads are opaque ``binary`` columns travelling next to a
typed metadata struct; all heavy per-item work (decode, resize, feature
extraction, frame sampling) runs in Arrow-batched ``mapInPandas`` kernels so
a 100 TB media table streams through executors in columnar batches without
ever materializing rows driver-side.

The decode kernels themselves are STUBS in this environment (no
image/audio libraries in the container): ``decode_fn=None`` uses a
deterministic fake decoder so the Spark-side plumbing — schema, batch
iteration, partitioning, output shapes — is real and tested; pass a real
``decode_fn(payload: bytes) -> np.ndarray`` in production.
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


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
    dim: int = 32,
    batch_hint: int = 256,
) -> DataFrame:
    """media table → (media_id, kind, n_bytes, feature array<float>).

    ``mapInPandas``: one Arrow batch of payloads in, one batch of features
    out — the executor never holds more than a batch of raw media in memory.
    Repartition upstream by size if payloads are skewed (hot-video problem),
    e.g. ``media.repartitionByRange(n, "media_id")``.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if decode_fn is not None:
                    vec = np.asarray(decode_fn(payload), dtype=np.float32)
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

    cols = media.select("media_id", "kind", "payload")
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
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(64, 2048))).astype(np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                64 if kind == "image" else None,
                64 if kind == "image" else None,
                int(rng.integers(500, 10_000)) if kind != "image" else None,
                {"image": "png", "audio": "pcm", "video": "h264"}[kind],
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
