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
