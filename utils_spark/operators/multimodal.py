"""Multimodal column operators: image/audio/video as opaque binary columns
with typed metadata (north-star surface, BASELINE.json).

Design: media bytes live in a `binary` column next to typed metadata
(media_type, width/height/duration, codec); decode / feature-extraction /
resize / frame-sampling run as Arrow-batched pandas iterators via
mapInPandas, so each task streams record batches without materializing
the full partition. The decode kernels are STUBBED (image/audio libs are
not in this container — clearly marked below); the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # 'image' | 'audio' | 'video'
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),  # image/video
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),  # audio/video
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_hash", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _decode_image(content: bytes) -> "object":
    """STUB — real implementation requires an image codec library (PIL /
    opencv), absent in this container. The Spark plumbing around this stub
    (schema, Arrow batching, partition streaming) is the deliverable."""
    raise NotImplementedError("image decoding requires PIL/opencv; not available in this environment")


def _fake_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector: md5-seeded
    pseudo-features so downstream plumbing (similarity joins, dedup) is
    testable without codecs. Replace with a real extractor in production."""
    h = hashlib.md5(content).digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_media_features(media: DataFrame, batch_feature_dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns via
    mapInPandas: each task receives an iterator of pandas record batches
    (bounded memory regardless of partition size) and yields feature rows.

    At 100 TB: media rows are large → keep spark.sql.files.maxPartitionBytes
    moderate, and rely on the iterator-of-batches form below (never collect
    a whole partition into one pandas frame)."""

    dim = batch_feature_dim

    def proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_hash": pdf["content"].map(lambda b: hashlib.md5(b).hexdigest()),
                    "features": pdf["content"].map(lambda b: _fake_features(bytes(b), dim)),
                }
            )

    return media.mapInPandas(proc, FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    rows via sequence/explode — the decode of each frame is the stubbed
    kernel; the partition-parallel frame ENUMERATION is real Spark."""
    video = media.filter(F.col("media_type") == "video")
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
    )


def media_dedup_by_content(media: DataFrame) -> DataFrame:
    """Exact media dedup by content hash (binary-safe md5) — same
    hash-groupBy shape as text exact dedup; shuffles 16-byte digests."""
    return (
        media.select("media_id", F.md5(F.col("content")).alias("content_hash"))
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("media_id").alias("canonical_id"))
        .filter(F.col("n_copies") > 1)
    )
