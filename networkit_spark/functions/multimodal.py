"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features behind ``decode_stub=True``, or
NotImplementedError when a real decoder is requested) — but everything
Spark-side is real and tested: schema, Arrow batch shape, mapInPandas
plumbing, partitioning. Swapping in PIL/librosa later changes only the
body of ``_decode_one``.

Schema convention:
  media(media_id long, kind string, payload binary,
        meta struct<width int, height int, sample_rate int, n_frames int>)
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _decode_one(payload: bytes, kind: str, decode_stub: bool) -> np.ndarray:
    """Decode payload -> feature vector. STUB: real decoders are not in
    this container; the deterministic fake derives FEATURE_DIM floats
    from sha256(payload) so plumbing tests have stable expectations."""
    if not decode_stub:
        raise NotImplementedError(
            "real image/audio decode requires PIL/librosa, not present in "
            "this environment; pass decode_stub=True"
        )
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((FEATURE_DIM * 4) // len(digest) + 1))[: FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw % 1000).astype(np.float64) / 1000.0


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """(media_id, kind, features array<double>) via Arrow-batched
    mapInPandas; payload bytes never leave the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_one(bytes(p) if p is not None else b"", k, decode_stub).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema="media_id long, kind string, features array<double>"
    )


def resize_images(media: DataFrame, width: int, height: int,
                  decode_stub: bool = True) -> DataFrame:
    """(media_id, payload, meta) with meta.width/height rewritten; the
    pixel transform itself is stubbed (payload passed through) — the
    plumbing (struct rebuild, filter pushdown on kind) is real."""
    if not decode_stub:
        raise NotImplementedError("real resize requires an image codec")
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
        ).alias("meta"),
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """(media_id, frame_idx) — frame indices 0, n, 2n, ... per video,
    entirely JVM-side from meta.n_frames (no decode needed)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.n_frames") - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def gen_media_pdf(n: int, seed: int = 42) -> pd.DataFrame:
    """Deterministic synthetic media table for tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + (i % 5) * 16)
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": payload,
                "meta": {
                    "width": 640 if kind == "image" else None,
                    "height": 480 if kind == "image" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": 120 if kind == "video" else None,
                },
            }
        )
    return pd.DataFrame(rows)
