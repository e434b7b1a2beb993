"""Multimodal column plumbing: opaque binary payloads with typed
metadata, decoded/feature-extracted via mapInPandas.

The image/audio decode libraries are not available in this container,
so the decode step is a deterministic fake behind ``FAKE_DECODE``
(clearly marked; swap in PIL/librosa in production). The Spark-side
plumbing — schema, Arrow batch shape, partition-stable iteration — is
real and tested.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
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
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

FAKE_DECODE = True  # no codec libs in this container


def synth_media(spark: SparkSession, df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic media table from any id column: payload
    bytes are a seeded function of the id (stands in for real blobs)."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(
        F.concat(F.lit("BLOB:"), F.md5(F.col(id_col).cast("string"))), "UTF-8"
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        (F.col(id_col) % 1920 + 16).cast("int").alias("width"),
        (F.col(id_col) % 1080 + 16).cast("int").alias("height"),
        (F.col(id_col) % 60000).cast("int").alias("duration_ms"),
    )


def _decode_feature(payload: bytes, kind: str, dim: int = 8) -> np.ndarray:
    """STUB decode: a deterministic fake feature vector.

    Production would decode the payload (PIL / ffmpeg / librosa) and
    extract real features; the container has no codecs, so we derive a
    stable pseudo-feature from the payload digest instead.
    """
    if not FAKE_DECODE:  # pragma: no cover
        raise NotImplementedError("real codecs not available in this container")
    digest = hashlib.sha256(payload + kind.encode()).digest()
    vals = struct.unpack("<8I", digest[:32])
    return (np.array(vals, dtype=np.float64) / 2**32).astype(np.float32)[:dim]


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_feature(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)
