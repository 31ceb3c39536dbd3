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


def test_binary_dir_scan(spark, tmp_path):
    (tmp_path / "a.bin").write_bytes(b"\x89PNG fake image bytes")
    (tmp_path / "b.bin").write_bytes(b"RIFF fake audio bytes")
    media = multimodal.read_binary_dir(spark, str(tmp_path), glob="*.bin")
    rows = media.collect()
    assert len(rows) == 2
    assert {bytes(r["payload"])[:4] for r in rows} == {b"\x89PNG", b"RIFF"}
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 2
