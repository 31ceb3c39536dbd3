"""Multimodal (image/audio/video) column plumbing (north-star E9).

Design: media are opaque ``binary`` columns + a typed metadata struct,
scanned via the ``binaryFile`` source (or stored inline in parquet).
All heavy per-item work — decode, resize, feature-extract, frame-sample
— runs in Arrow-batched ``mapInPandas`` so bytes never round-trip
through the driver and Python sees whole columnar batches.

The actual codecs (Pillow/librosa/ffmpeg) are NOT in this container, so
the decode kernels are deterministic fakes behind ``_HAVE_CODECS``
guards — the Spark-side contract (schemas, batch shapes, partitioning)
is real and tested; swap the kernel body for the real library in
production. This mirrors how the reference treats zip bytes as opaque
until one decode step (feeder.py:119-121).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

try:  # real codecs when present
    import PIL.Image  # noqa: F401
    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)
FEATURE_SCHEMA = "media_id long, feature array<float>, n_bytes long, checksum string"


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """E9 scan: binaryFile source — one task per file, bytes stay on
    executors (generalizes the reference's zip handling, op #2)."""
    from pyspark.sql import functions as F
    return (spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
            .select(F.abs(F.xxhash64("path")).alias("media_id"),
                    F.col("content").alias("payload"),
                    F.lit("image").alias("media_type"),
                    F.lit(None).cast("struct<width:int,height:int,sample_rate:int,n_frames:int>")
                     .alias("meta")))


def _fake_decode_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode→embed: md5-seeded pseudo
    feature vector. Replace with a real vision/audio model batch call;
    the Spark plumbing around it is identical."""
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """E9 transform: per-item decode + feature extraction in
    mapInPandas. Arrow batches bound memory; partition count controls
    parallelism, so at 100 TB this is ``repartition(n_tasks)`` away
    from full-cluster utilization."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _HAVE_CODECS:
            raise NotImplementedError(
                "real codec path not wired in this container; "
                "plug Pillow/librosa decode here")
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feature": [_fake_decode_features(p, dim) for p in payloads],
                "n_bytes": [len(p) for p in payloads],
                "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
            })

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test adapter: documents.text bytes play the opaque payload so the
    whole E9 path is exercisable on the synthetic fixtures."""
    from pyspark.sql import functions as F
    from cati_database_feeder_spark.catalog import load_table
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("text").alias("media_type"),
        F.lit(None).cast("struct<width:int,height:int,sample_rate:int,n_frames:int>").alias("meta"))
