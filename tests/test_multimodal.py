"""Multimodal plumbing: binary payload → mapInPandas feature extraction
(deterministic fake kernel; the Spark-side schema/batching is real)."""

import hashlib

from cati_database_feeder_spark.sources import multimodal


def test_extract_features_schema_and_determinism(spark, sf_dir):
    media = multimodal.documents_as_media(spark, sf_dir)
    feats = multimodal.extract_features(media, dim=8)
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,feature:array<float>,n_bytes:bigint,checksum:string>")
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == media.count()
    # kernel is deterministic: recompute one row by hand
    doc = media.filter("media_id = 0").collect()[0]
    payload = bytes(doc["payload"])
    assert rows[0]["checksum"] == hashlib.md5(payload).hexdigest()
    assert rows[0]["n_bytes"] == len(payload)
    assert len(rows[0]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in rows[0]["feature"])


def test_resize_images_contract(spark, sf_dir):
    media = multimodal.documents_as_media(spark, sf_dir).limit(20)
    out = multimodal.resize_images(media, width=8, height=4)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(bytes(r["payload"])) == 32 for r in rows)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 4 for r in rows)


def test_sample_frames_fanout(spark, sf_dir):
    media = multimodal.documents_as_media(spark, sf_dir).limit(5)
    frames = multimodal.sample_frames(media, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 20                       # 5 media × 4 frames
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, fr in by_media.items():
        assert sorted(f["frame_idx"] for f in fr) == [0, 1, 2, 3]
        # frames are byte ranges of the source payload, in order
        joined = b"".join(bytes(f["frame"]) for f in
                          sorted(fr, key=lambda f: f["frame_idx"]))
        assert src[mid].startswith(joined[:len(src[mid])])


def test_binary_dir_scan(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x89PNG fake image bytes")
    (tmp_path / "b.bin").write_bytes(b"RIFF fake audio bytes")
    media = multimodal.read_binary_dir(spark, str(tmp_path), glob="*.bin")
    rows = media.collect()
    assert len(rows) == 2
    assert {bytes(r["payload"])[:4] for r in rows} == {b"\x89PNG", b"RIFF"}
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 2


def test_codec_guard_never_raises(spark, sf_dir):
    """Forcing the real-codec path on undecodable payloads (or with the
    codec library absent) must fall back per item to the deterministic
    fake — a poison payload must never kill the stage."""
    media = multimodal.documents_as_media(spark, sf_dir).limit(20)
    forced = multimodal.extract_features(media, use_real_codecs=True).collect()
    fake = multimodal.extract_features(media, use_real_codecs=False).collect()
    assert len(forced) == len(fake) == 20
    if not multimodal._HAVE_CODECS:
        # no Pillow: forced path degrades to exactly the fake features
        assert {r["media_id"]: r["feature"] for r in forced} == \
               {r["media_id"]: r["feature"] for r in fake}
    resized = multimodal.resize_images(media, 8, 8, use_real_codecs=True).collect()
    assert all(len(bytes(r["payload"])) == 64 for r in resized)


# ---- real (dependency-free) codec tier -------------------------------

def _make_ppm(w, h, rgb):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(rgb) * (w * h)


def _make_pgm(w, h, val):
    return b"P5\n# comment\n%d %d\n255\n" % (w, h) + bytes([val]) * (w * h)


def _make_bmp24(w, h, bgr):
    import struct
    stride = (w * 3 + 3) & ~3
    img = (bytes(bgr) * w).ljust(stride, b"\0") * h
    header = (b"BM" + struct.pack("<IHHI", 54 + len(img), 0, 0, 54)
              + struct.pack("<iiiHHIIiiII", 40, w, h, 1, 24, 0, len(img),
                            2835, 2835, 0, 0))
    return header + img


def _make_wav(rate, samples):
    import struct
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_decode_image_gray_formats():
    g = multimodal.decode_image_gray(_make_ppm(4, 2, (255, 0, 0)))
    assert g.shape == (2, 4)
    assert abs(g[0, 0] - 85 / 255) < 1e-9       # mean of (255,0,0)
    g = multimodal.decode_image_gray(_make_pgm(3, 3, 128))
    assert g.shape == (3, 3) and abs(g[1, 1] - 128 / 255) < 1e-9
    g = multimodal.decode_image_gray(_make_bmp24(5, 3, (0, 0, 255)))
    assert g.shape == (3, 5) and abs(g[0, 0] - 85 / 255) < 1e-9
    import pytest
    with pytest.raises(ValueError):
        multimodal.decode_image_gray(b"\x89PNG not supported without Pillow")


def test_decode_wav_pcm16():
    rate, mono = multimodal.decode_wav_pcm16(_make_wav(8000, [0, 16384, -16384, 0]))
    assert rate == 8000
    assert len(mono) == 4
    assert abs(mono[1] - 0.5) < 1e-4 and abs(mono[2] + 0.5) < 1e-4


def test_extract_features_real_decode(spark):
    rows = [
        (1, _make_ppm(8, 8, (255, 255, 255)), "image", None),   # white image
        (2, _make_wav(8000, [16384] * 800), "audio", None),     # constant tone
        (3, b"corrupt payload", "image", None),                 # fake fallback
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = {r["media_id"]: r["feature"]
             for r in multimodal.extract_features(media, dim=4).collect()}
    assert all(abs(v - 1.0) < 1e-6 for v in feats[1])       # real pixels
    assert all(abs(v - 0.5) < 1e-3 for v in feats[2])       # RMS of 0.5 tone
    expected_fake = multimodal._fake_decode_features(b"corrupt payload", 4)
    assert all(abs(a - b) < 1e-6 for a, b in zip(feats[3], expected_fake))


def test_resize_images_real_decode(spark):
    # 2x2 PPM: left column black, right column white → nn-resize to 4x2
    payload = (b"P6\n2 2\n255\n"
               + bytes((0, 0, 0)) + bytes((255, 255, 255))
               + bytes((0, 0, 0)) + bytes((255, 255, 255)))
    media = spark.createDataFrame([(1, payload, "image", None)],
                                  multimodal.MEDIA_SCHEMA)
    out = multimodal.resize_images(media, width=4, height=2).collect()[0]
    px = list(bytes(out["payload"]))
    assert px == [0, 0, 255, 255, 0, 0, 255, 255]


def _make_pgm_px(w, h, pixels):
    assert len(pixels) == w * h
    return b"P5\n%d %d\n255\n" % (w, h) + bytes(pixels)


def _grad_image(jitter_at=None):
    """16x16 gradient: value = x*15 — every dHash comparison True.
    ``jitter_at=x`` zeroes the single sampled pixel (x, y=0), flipping
    exactly ONE comparison (the left neighbor's margin is 30, the
    right neighbor still dominates 0)."""
    px = [[min(255, x * 15) for x in range(16)] for _ in range(16)]
    if jitter_at is not None:
        px[0][jitter_at] = 0
    return _make_pgm_px(16, 16, [v for row in px for v in row])


def test_real_dhash_near_dup_geometry():
    """The pure kernel: a 1-pixel edit at a sampled location flips
    exactly one of the 60 comparisons; a structurally different image
    is tens of bits away."""
    base = multimodal._real_dhash(_grad_image())
    near = multimodal._real_dhash(_grad_image(jitter_at=4))
    far = multimodal._real_dhash(_make_pgm_px(
        16, 16, [(x * 97 + y * 11) % 256 for y in range(16)
                 for x in range(16)]))
    assert bin(base ^ near).count("1") == 1
    assert bin(base ^ far).count("1") > 10
    assert 0 <= base < (1 << 60)


def test_dhash_pairs_equal_brute_force(spark):
    """E72 completeness pin: pigeonhole banding (4 chunks, max_hamming
    3) must find EXACTLY the brute-force pair set — including a
    planted identical pair (rep-collapse/expand path, hamming 0),
    1-bit near-dups, and a corrupt payload riding the fake tier."""
    from cati_database_feeder_spark.operators.dedup import (
        hamming_near_dup_pairs)
    rows = [(1, _grad_image(), "image", None),
            (2, _grad_image(), "image", None),           # exact dup of 1
            (3, _grad_image(jitter_at=4), "image", None),  # 1 bit off
            (4, _grad_image(jitter_at=9), "image", None),  # 1 bit off
            (5, b"corrupt payload bytes", "image", None)]  # fake tier
    for seed in range(6, 20):
        rows.append((seed, _make_pgm_px(
            16, 16, [(seed * x * x + y * 17) % 256
                     for y in range(16) for x in range(16)]),
            "image", None))
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    hashes = multimodal.image_dhash(media)
    collected = {r["media_id"]: (r["dhash"], r["real"])
                 for r in hashes.collect()}
    assert collected[5][1] is False
    assert collected[5][0] == multimodal._fake_dhash(
        b"corrupt payload bytes")
    assert collected[1][1] is True and collected[1] == collected[2]
    brute = set()
    ids = sorted(collected)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(collected[a][0] ^ collected[b][0]).count("1") <= 3:
                brute.add((a, b))
    got = {(r["id_a"], r["id_b"])
           for r in hamming_near_dup_pairs(
               hashes, bits=60, max_hamming=3, chunks=4).collect()}
    assert got == brute
    assert {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)} <= got


def _make_clip(phase=0.0, vol=1.0, shift=0, n=6100):
    """Synthetic near-dup audio family: a ±carrier under a slow sine
    energy envelope (period 1200 samples = 12 hash slices). ``vol``
    scales amplitude (must NOT move the hash — RMS comparisons are
    scale-invariant); ``shift`` prepends silence samples (moves the
    envelope by shift/100 slices — 120 flips exactly the 2 comparisons
    whose neighboring slices swap); ``phase`` changes the envelope
    itself (a different clip, tens of bits away)."""
    import math
    import struct

    def pack(samples):
        data = b"".join(struct.pack("<h", max(-32768, min(32767, int(s))))
                        for s in samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
                + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)

    out = [0.0] * shift
    for i in range(n):
        env = 6000 + 5000 * math.sin(2 * math.pi * i / 1200 + phase)
        out.append(vol * env * (1 if (i % 2) else -1))
    return pack(out)


def test_real_audio_hash_invariances():
    """E83 kernel pins: volume scaling is hash-INVARIANT (RMS ratios
    unchanged), a sub-slice time shift flips only the comparisons
    whose neighbors swap (within the banded join's max_hamming=3),
    and a different envelope is tens of bits away."""
    base = multimodal._real_audio_hash(_make_clip())
    assert 0 <= base < (1 << 60)
    vol = multimodal._real_audio_hash(_make_clip(vol=0.4))
    assert bin(base ^ vol).count("1") == 0
    shifted = multimodal._real_audio_hash(_make_clip(shift=120))
    assert 0 < bin(base ^ shifted).count("1") <= 3
    far = multimodal._real_audio_hash(_make_clip(phase=2.0))
    assert bin(base ^ far).count("1") > 10


def test_audio_pairs_equal_brute_force(spark):
    """E83 completeness pin (the dhash discipline on the audio
    fingerprint): pigeonhole banding must find EXACTLY the brute-force
    pair set over real-decoded WAVs — including the volume-scaled
    twin (hamming 0, rep-collapse path), the time-shifted twin
    (nonzero hamming), and a corrupt payload riding the fake tier."""
    from cati_database_feeder_spark.operators.dedup import (
        hamming_near_dup_pairs)
    rows = [(1, _make_clip(), "audio", None),
            (2, _make_clip(vol=0.4), "audio", None),    # volume twin
            (3, _make_clip(shift=120), "audio", None),  # time-shift twin
            (4, _make_clip(phase=2.0), "audio", None),
            (5, _make_clip(phase=4.5), "audio", None),
            (6, b"corrupt audio payload", "audio", None)]
    for seed in range(7, 16):
        rows.append((seed, _make_clip(phase=0.7 * seed), "audio", None))
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    hashes = multimodal.audio_fingerprint(media)
    collected = {r["media_id"]: (r["ahash"], r["real"])
                 for r in hashes.collect()}
    assert collected[6][1] is False
    assert collected[6][0] == multimodal._fake_dhash(
        b"corrupt audio payload")
    assert collected[1][1] is True
    assert collected[1][0] == collected[2][0]           # volume-invariant
    brute = set()
    ids = sorted(collected)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin(collected[a][0] ^ collected[b][0]).count("1") <= 3:
                brute.add((a, b))
    got = {(r["id_a"], r["id_b"])
           for r in hamming_near_dup_pairs(
               hashes, hash_col="ahash", bits=60, max_hamming=3,
               chunks=4).collect()}
    assert got == brute
    assert {(1, 2), (1, 3), (2, 3)} <= got
