"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decode / feature-extract / resize / frame-sample as mapInPandas stages.

The image/audio decode libraries are not in this container, so the
DECODE step is a deterministic fake (documented, byte-derived) behind
the same UDF signature a real decoder would use — the Spark-side
plumbing (schema, batching, partitioning) is real and tested. Swap
``_fake_decode`` for PIL/libav calls at deployment.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = ("media_id bigint, kind string, payload binary, "
                "width int, height int, duration_ms int")

FEATURES_SCHEMA = ("media_id bigint, kind string, n_bytes int, "
                   "sha256 string, feat array<float>, frames int")


def synthetic_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 7)
        rows.append((i, kind, bytearray(payload), 64 + i % 512, 64 + (i * 3) % 512,
                     (i + 1) * 250))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
    """STUB decoder: a real implementation calls PIL/torchaudio/pyav.
    Deterministic byte-derived 8-dim feature so tests are stable."""
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[:32], dtype=np.uint8).reshape(8, 4).mean(axis=1) / 255.0


def extract_features(media: DataFrame, frame_stride_ms: int = 1000) -> DataFrame:
    """decode -> feature-extract -> frame-sample, batched per Arrow
    batch; partition by media_id for even work distribution."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: List[dict] = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload or b"")
                feat = _fake_decode(payload, r.kind)
                frames = 1
                if r.kind == "video" and r.duration_ms:
                    frames = max(1, int(r.duration_ms) // frame_stride_ms)
                out.append({
                    "media_id": r.media_id, "kind": r.kind,
                    "n_bytes": len(payload),
                    "sha256": hashlib.sha256(payload).hexdigest(),
                    "feat": [float(x) for x in feat],
                    "frames": frames,
                })
            yield pd.DataFrame(out, columns=["media_id", "kind", "n_bytes",
                                             "sha256", "feat", "frames"])

    return media.repartition("media_id").mapInPandas(gen, FEATURES_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize metadata transform (the geometry math is real; pixel
    resampling is the stubbed decode step)."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height")).otherwise(F.lit(1.0))
    return (media.filter(F.col("kind") == "image")
            .withColumn("out_width", F.floor(F.col("width") * scale).cast("int"))
            .withColumn("out_height", F.floor(F.col("height") * scale).cast("int")))
