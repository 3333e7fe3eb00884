"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition sizing) is
real and tested; the actual media DECODE is stubbed because codec
libraries (Pillow/ffmpeg/torchaudio) are not in this container:

  * decode="strict"  -> NotImplementedError (the clearly-marked stub)
  * decode="fake"    -> deterministic fake decoder: metadata and feature
    vectors derived from a stable hash of the bytes — same shape, same
    schema, same batch behavior as a real decoder, so every downstream
    operator (resize plan, frame sampling, feature join) is exercised
    for real.

Batches stream through mapInPandas an Arrow batch at a time, so peak
executor memory is one batch of decoded media, not one partition —
that, plus `spark.sql.files.maxPartitionBytes` on the binary scan, is
the knob pair that keeps 100 TB of media from OOMing executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature", ArrayType(FloatType())),  # decoded feature vec
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for a real decoder: dims and a feature
    vector derived from the content hash. Replace with PIL/ffmpeg at
    deployment — signature and schema stay identical."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 32
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    feat = np.resize(rng, FEATURE_DIM) / 255.0
    return width, height, n_frames, [float(x) for x in feat]


def decode_media(
    df: DataFrame,
    id_col: str = "url",
    bytes_col: str = "html",
    kind: str = "image",
    mode: str = "fake",
) -> DataFrame:
    """mapInPandas decode: binary column -> typed metadata + feature
    vector. mode='strict' raises (no codecs in this container)."""
    if mode == "strict":
        raise NotImplementedError(
            "real media decoding needs codec libraries not present in this "
            "environment; run with mode='fake' for the deterministic stub"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                _fake_decode(bytes(b) if b is not None else b"")
                for b in pdf[bytes_col]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "kind": kind,
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf[bytes_col]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                    "feature": [m[3] for m in metas],
                }
            )

    return df.select(id_col, bytes_col).mapInPandas(
        decode_batches, schema=MEDIA_META_SCHEMA
    )


def resize_plan(meta: DataFrame, max_side: int = 224) -> DataFrame:
    """Pure-expression resize planning over decoded metadata: target
    dims preserving aspect ratio (the decode-side work would consume
    this plan batch-wise)."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"),
        F.lit(1.0),
    )
    return meta.select(
        "media_id",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    )


def sample_frames(meta: DataFrame, every_n: int = 5) -> DataFrame:
    """(media_id, frame_idx) — deterministic frame sampling plan for
    video rows; explode of a sequence, no UDF."""
    return meta.filter(F.col("n_frames") > 1).select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
