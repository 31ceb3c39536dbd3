"""Multimodal (image/audio/video) column plumbing (north-star E9).

Design: media are opaque ``binary`` columns + a typed metadata struct,
scanned via the ``binaryFile`` source (or stored inline in parquet).
All heavy per-item work — decode, resize, feature-extract, frame-sample
— runs in Arrow-batched ``mapInPandas`` so bytes never round-trip
through the driver and Python sees whole columnar batches.

Codec strategy, three tiers per item:
1. pure-numpy decoders for uncompressed formats — PGM (P5) / PPM (P6),
   24-bit BMP, PCM-16 WAV — always available, run REAL decode in any
   container;
2. Pillow, when importable, for compressed image formats;
3. a deterministic md5 fake as the per-item fallback, so the pipeline
   NEVER raises on undecodable bytes — at 100 TB some fraction of
   payloads is always corrupt, and a poison row must not kill the
   stage.
The Spark-side contract (schemas, batch shapes, partitioning) is
identical on all paths and pinned by tests. This mirrors how the
reference treats zip bytes as opaque until one decode step
(feeder.py:119-121).
"""

from __future__ import annotations

import hashlib
import re
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

try:  # optional extra codecs (compressed formats)
    import PIL.Image  # noqa: F401
    _HAVE_CODECS = True
except ImportError:
    _HAVE_CODECS = False

_PNM_HEADER = re.compile(
    rb"(P[56])\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)\s+(?:#[^\n]*\n\s*)*(\d+)\s")


def decode_image_gray(payload: bytes) -> np.ndarray:
    """Pure-numpy image decode: PGM(P5)/PPM(P6) and uncompressed 24-bit
    BMP → 2-D grayscale float array in [0, 1]. Raises ValueError for
    any other format (callers fall through to Pillow / the fake)."""
    if payload[:2] in (b"P5", b"P6"):
        m = _PNM_HEADER.match(payload)
        if not m:
            raise ValueError("bad PNM header")
        magic, w, h, maxval = (m.group(1), int(m.group(2)),
                               int(m.group(3)), int(m.group(4)))
        if not (0 < maxval <= 255):
            # maxval > 255 means 2-byte big-endian samples — a different
            # stride; refuse rather than misparse
            raise ValueError("only 8-bit PNM samples")
        ch = 3 if magic == b"P6" else 1
        data = payload[m.end():m.end() + w * h * ch]
        if len(data) < w * h * ch:
            raise ValueError("truncated PNM payload")
        arr = np.frombuffer(data, dtype=np.uint8).reshape(h, w, ch).astype(np.float64)
        gray = arr.mean(axis=2) if ch == 3 else arr[:, :, 0]
        return gray / float(maxval)
    if payload[:2] == b"BM" and len(payload) >= 54:
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w = struct.unpack_from("<i", payload, 18)[0]
        h_raw = struct.unpack_from("<i", payload, 22)[0]
        bpp = struct.unpack_from("<H", payload, 28)[0]
        comp = struct.unpack_from("<I", payload, 30)[0]
        if bpp != 24 or comp != 0 or w <= 0 or h_raw == 0:
            raise ValueError("only uncompressed 24-bit BMP")
        h = abs(h_raw)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        if len(payload) < data_off + stride * h:
            raise ValueError("truncated BMP payload")
        rows = np.frombuffer(payload, dtype=np.uint8,
                             count=stride * h, offset=data_off)
        rows = rows.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
        if h_raw > 0:  # bottom-up storage
            rows = rows[::-1]
        return rows.astype(np.float64).mean(axis=2) / 255.0
    raise ValueError("unsupported image format")


def decode_wav_pcm16(payload: bytes) -> tuple[int, np.ndarray]:
    """Pure-numpy PCM-16 WAV decode → (sample_rate, mono float samples
    in [-1, 1]). Raises ValueError on anything but canonical
    RIFF/WAVE/fmt/data PCM-16."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None or len(fmt) < 16:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits != 16 or n_ch < 1:
        raise ValueError("only PCM-16")
    samples = np.frombuffer(data[:len(data) - len(data) % (2 * n_ch)],
                            dtype="<i2").astype(np.float64) / 32768.0
    return rate, samples.reshape(-1, n_ch).mean(axis=1)


def resize_gray_nn(gray: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of a 2-D array (vectorized index map)."""
    ys = (np.arange(height) * gray.shape[0]) // height
    xs = (np.arange(width) * gray.shape[1]) // width
    return gray[ys][:, xs]

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
    """Real decode → grayscale → dim×1 resample → normalized pixels.
    Numpy decoders first (always available), Pillow for compressed
    formats when importable. Raises on undecodable bytes; callers
    catch and fall back."""
    try:
        gray = decode_image_gray(payload)
        return [float(x) for x in resize_gray_nn(gray, dim, 1)[0]]
    except ValueError:
        if not _HAVE_CODECS:
            raise
    import io

    import PIL.Image
    img = PIL.Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
    return [px / 255.0 for px in img.getdata()]


def _real_audio_features(payload: bytes, dim: int) -> list[float]:
    """PCM-16 WAV → per-bucket RMS over ``dim`` equal time slices —
    the cheap audio fingerprint shape (real spectral features swap in
    the same kernel)."""
    _, samples = decode_wav_pcm16(payload)
    if samples.size == 0:
        raise ValueError("empty audio")
    chunks = np.array_split(samples, dim)
    return [float(np.sqrt(np.mean(c * c))) if c.size else 0.0 for c in chunks]


def extract_features(media: DataFrame, dim: int = 8,
                     use_real_codecs: bool | None = None) -> DataFrame:
    """E9 transform: per-item decode + feature extraction in
    mapInPandas. Arrow batches bound memory; partition count controls
    parallelism, so at 100 TB this is ``repartition(n_tasks)`` away
    from full-cluster utilization. Real decode first (numpy formats
    always, Pillow when available; WAV for media_type='audio');
    per-item fallback to the deterministic fake on decode failure —
    corrupt payloads must never kill the stage."""
    real = True if use_real_codecs is None else use_real_codecs

    def one(payload: bytes, media_type: str) -> list[float]:
        if real:
            try:
                if media_type == "audio":
                    return _real_audio_features(payload, dim)
                return _real_image_features(payload, dim)
            except Exception:
                pass
        return _fake_decode_features(payload, dim)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "feature": [one(p, t) for p, t in zip(payloads, pdf["media_type"])],
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
    real = True if use_real_codecs is None else use_real_codecs
    target = width * height

    def one(payload: bytes) -> bytes:
        if real:
            try:
                gray = decode_image_gray(payload)
                out = resize_gray_nn(gray, width, height)
                return (out * 255.0).round().clip(0, 255).astype(np.uint8).tobytes()
            except Exception:
                pass
            if _HAVE_CODECS:
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


# ---------------------------------------------------------------------
# Perceptual hashing (extension E72): 60-bit dHash + the fake tier
# ---------------------------------------------------------------------

DHASH_BITS = 60          # the repo-wide 60-bit signed-int64 convention
_DHASH_GRID_W = 7        # (w-1)·h comparisons = 6 × 10 = 60 bits
_DHASH_GRID_H = 10


def _real_dhash(payload: bytes) -> int:
    """Difference hash over the real decode: grayscale → 7×10
    nearest-neighbor resample → 60 horizontal brighter-than-left
    comparisons packed MSB-first. Gradient-structured, so near-
    identical images (crop noise, brightness jitter, re-encode) land
    within a few bits while distinct images differ in ~30."""
    gray = decode_image_gray(payload)
    g = resize_gray_nn(gray, _DHASH_GRID_W, _DHASH_GRID_H)
    v = 0
    for bit in (g[:, 1:] > g[:, :-1]).flatten():
        v = (v << 1) | int(bit)
    return v


def _fake_dhash(payload: bytes) -> int:
    """Deterministic fake tier: the first 15 md5 hex chars as a 60-bit
    int — EXACTLY the engine's hash64 convention
    (functions/text.py:hash64, `conv(substr(md5(x),1,15),16,10)`), so
    a SQL oracle replays the fake tier bit-for-bit."""
    return int(hashlib.md5(payload).hexdigest()[:15], 16)


AUDIO_HASH_BITS = 60     # 61 RMS slices → 60 envelope comparisons


def _real_audio_hash(payload: bytes) -> int:
    """Envelope difference hash over the real WAV decode (extension
    E83 — the audio sibling of :func:`_real_dhash`): mono PCM → 61
    equal time slices → per-slice RMS → 60 louder-than-previous
    comparisons packed MSB-first. Scale-INVARIANT by construction
    (volume scaling multiplies every RMS by the same constant, so the
    comparisons are unchanged) and tolerant of small time shifts (the
    energy envelope moves by a fraction of a slice, flipping only the
    few bits whose neighboring slices swap order) — the two
    perturbations a near-dup audio scan must survive. A production
    kernel swaps per-band spectral energies into the same 60-bit
    comparison frame; the banding join downstream is unchanged."""
    _, samples = decode_wav_pcm16(payload)
    if samples.size == 0:
        raise ValueError("empty audio")
    chunks = np.array_split(samples, AUDIO_HASH_BITS + 1)
    rms = np.array([float(np.sqrt(np.mean(c * c))) if c.size else 0.0
                    for c in chunks])
    v = 0
    for bit in rms[1:] > rms[:-1]:
        v = (v << 1) | int(bit)
    return v


def audio_fingerprint(media: DataFrame,
                      use_real_codecs: bool | None = None) -> DataFrame:
    """E83 transform: per-clip 60-bit envelope hash in mapInPandas —
    ``(media_id, ahash long, real boolean)``. Same three-tier ladder
    as :func:`image_dhash`: real PCM-16 WAV decode when the payload
    parses, the md5 fake (the engine's hash64 convention, so a SQL
    oracle replays it bit-for-bit) per undecodable item — corrupt
    payloads at 100 TB hash to uniform noise and simply never collide.
    Feed the output straight into
    ``operators/dedup.py:hamming_near_dup_pairs(hash_col='ahash')``."""
    real = True if use_real_codecs is None else use_real_codecs

    def one(payload: bytes) -> tuple[int, bool]:
        if real:
            try:
                return _real_audio_hash(payload), True
            except Exception:
                pass
        return _fake_dhash(payload), False

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [one(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "ahash": [h for h, _ in out],
                "real": [r for _, r in out],
            })

    return media.mapInPandas(
        kernel, schema="media_id long, ahash long, real boolean")


def image_dhash(media: DataFrame,
                use_real_codecs: bool | None = None) -> DataFrame:
    """E72 transform: per-image perceptual hash in mapInPandas —
    ``(media_id, dhash long, real boolean)``. Same three-tier ladder
    as extract_features: numpy decode always, Pillow when importable,
    md5 fake per undecodable item (corrupt payloads at 100 TB must
    never kill the stage — they hash to uniform noise and simply
    never collide). ``real`` records which tier ran, so a pipeline
    can audit its decode coverage with one aggregate."""
    real = True if use_real_codecs is None else use_real_codecs

    def one(payload: bytes) -> tuple[int, bool]:
        if real:
            try:
                return _real_dhash(payload), True
            except Exception:
                pass
        return _fake_dhash(payload), False

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [one(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "dhash": [h for h, _ in out],
                "real": [r for _, r in out],
            })

    return media.mapInPandas(
        kernel, schema="media_id long, dhash long, real boolean")
