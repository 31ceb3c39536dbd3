"""Multimodal (image/audio/video) column plumbing (north-star E9).

Design: media are opaque ``binary`` columns + a typed metadata struct,
scanned via the ``binaryFile`` source (or stored inline in parquet).
All heavy per-item work — decode, resize, feature-extract, frame-sample
— runs in Arrow-batched ``mapInPandas`` so bytes never round-trip
through the driver and Python sees whole columnar batches.

Codec strategy: when Pillow is importable the kernels decode for real;
any per-item decode failure (or a missing library) falls back to a
deterministic fake, so the pipeline NEVER raises on undecodable bytes
— at 100 TB some fraction of payloads is always corrupt, and a poison
row must not kill the stage. The Spark-side contract (schemas, batch
shapes, partitioning) is identical on both paths and pinned by tests.
This mirrors how the reference treats zip bytes as opaque until one
decode step (feeder.py:119-121).
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
    feature vector. The fallback for undecodable payloads (and the
    whole path when no codec library is installed)."""
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def _real_image_features(payload: bytes, dim: int) -> list[float]:
    """Pillow decode → grayscale → dim×1 resample → normalized pixels.
    Raises on undecodable bytes; callers catch and fall back."""
    import io

    import PIL.Image
    img = PIL.Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
    return [px / 255.0 for px in img.getdata()]


def extract_features(media: DataFrame, dim: int = 8,
                     use_real_codecs: bool | None = None) -> DataFrame:
    """E9 transform: per-item decode + feature extraction in
    mapInPandas. Arrow batches bound memory; partition count controls
    parallelism, so at 100 TB this is ``repartition(n_tasks)`` away
    from full-cluster utilization. Real Pillow decode when available;
    per-item fallback to the deterministic fake on decode failure —
    corrupt payloads must never kill the stage."""
    real = _HAVE_CODECS if use_real_codecs is None else use_real_codecs

    def one(payload: bytes) -> list[float]:
        if real:
            try:
                return _real_image_features(payload, dim)
            except Exception:
                pass
        return _fake_decode_features(payload, dim)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feature": [one(p) for p in payloads],
                "n_bytes": [len(p) for p in payloads],
                "checksum": [hashlib.md5(p).hexdigest() for p in payloads],
            })

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int = 64, height: int = 64,
                  use_real_codecs: bool | None = None) -> DataFrame:
    """E9 transform: batch image resize in mapInPandas. Real path:
    Pillow decode → ``Image.resize`` → raw grayscale bytes. Fallback
    (missing library or undecodable item): truncate/zero-pad the
    payload to width·height bytes. Both paths keep the contract the
    pipeline depends on — same row count, payload replaced, meta dims
    set — which is what the test pins."""
    real = _HAVE_CODECS if use_real_codecs is None else use_real_codecs
    target = width * height

    def one(payload: bytes) -> bytes:
        if real:
            try:
                import io

                import PIL.Image
                img = PIL.Image.open(io.BytesIO(payload)).convert("L")
                return img.resize((width, height)).tobytes()
            except Exception:
                pass
        return payload[:target].ljust(target, b"\0")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [one(bytes(p)) for p in pdf["payload"]]
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
    ``n_frames`` evenly spaced frames (byte-range chunks; a production
    kernel swaps in ffmpeg keyframe extraction — the fan-out shape and
    schema stay the same). Emits one row per frame — the explode-inside-
    mapInPandas shape that turns a video corpus into a frame corpus for
    downstream image ops."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
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
