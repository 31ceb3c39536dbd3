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


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """E9 transform: batch image resize in mapInPandas. The fake kernel
    truncates/zero-pads the payload to width·height bytes (a real one
    calls Pillow ``Image.resize`` on the decoded batch); the contract —
    same row count, payload bytes replaced, meta dims set — is what the
    pipeline depends on and what the test pins."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _HAVE_CODECS:
            raise NotImplementedError(
                "real codec path not wired in this container; "
                "plug Pillow resize here")
        target = width * height
        for pdf in batches:
            payloads = [bytes(p)[:target].ljust(target, b"\0") for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": payloads,
                "media_type": pdf["media_type"],
                "meta": [{"width": width, "height": height,
                          "sample_rate": None, "n_frames": None}] * len(pdf),
            })

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """E9 transform, one-to-many: split each video payload into
    ``n_frames`` evenly spaced frames (fake kernel: byte-range chunks;
    real kernel: ffmpeg keyframe extraction). Emits one row per frame —
    the fan-out shape (explode inside mapInPandas) that turns a video
    corpus into a frame corpus for downstream image ops."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if _HAVE_CODECS:
            raise NotImplementedError(
                "real codec path not wired in this container; "
                "plug ffmpeg frame sampling here")
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                step = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * step:(i + 1) * step])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return media.mapInPandas(
        kernel, schema="media_id long, frame_idx int, frame binary")


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
