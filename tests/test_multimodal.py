"""Multimodal plumbing tests: schema contracts, Arrow batch shapes,
determinism of the stubbed decode, strict-mode refusal."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG fake bytes 1", "image/png", 64, 64, None),
        (2, "image", b"\x89PNG fake bytes 2", "image/png", 32, 32, None),
        (3, "video", b"\x00\x00ftyp fake mp4", "video/mp4", 640, 480, 3500),
        (4, "audio", b"RIFF fake wav", "audio/wav", None, None, 2000),
        (5, "image", None, "image/png", None, None, None),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA).repartition(2)


def test_image_features_schema_and_shape(media):
    feats = multimodal.image_features(media, dim=64)
    rows = feats.collect()
    assert feats.schema == multimodal.IMAGE_FEATURES_SCHEMA
    assert sorted(r["media_id"] for r in rows) == [1, 2, 5]
    assert all(r["feat_dim"] == 64 and len(r["features"]) == 64 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["features"])


def test_image_features_deterministic(media):
    a = {r["media_id"]: r["features"] for r in multimodal.image_features(media).collect()}
    b = {r["media_id"]: r["features"] for r in multimodal.image_features(media).collect()}
    assert a == b


def test_null_content_yields_zero_vector(media):
    feats = {r["media_id"]: r["features"] for r in multimodal.image_features(media).collect()}
    assert feats[5] == [0.0] * 64


def test_video_frame_sampling(media):
    frames = multimodal.sample_video_frames(media, every_ms=1000).collect()
    # 3500ms at 1 frame/s → 3 frames, contiguous indices, 32-byte payloads
    assert [r["frame_idx"] for r in frames] == [0, 1, 2]
    assert all(r["media_id"] == 3 and len(r["frame"]) == 32 for r in frames)


def test_strict_mode_raises(media):
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        multimodal.image_features(media, strict=True).collect()


def test_media_stats_jvm_only(media):
    stats = {r["kind"]: r for r in multimodal.media_stats(media).collect()}
    assert stats["image"]["n"] == 3
    assert stats["video"]["total_bytes"] == len(b"\x00\x00ftyp fake mp4")
