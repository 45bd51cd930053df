"""Multimodal plumbing: schemas, mapInPandas batching, stubbed codecs."""

from __future__ import annotations

import pytest

from frontier_engine import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", MM.fake_media_bytes("image", 64, 48, seed=1), ("image/x-fake", 64, 48, None)),
        (2, "audio", MM.fake_media_bytes("audio", 0, 0, seed=2, n=512), ("audio/x-fake", 0, 0, 3000)),
        (3, "video", MM.fake_media_bytes("video", 32, 32, seed=3, n=1024), ("video/x-fake", 32, 32, 9000)),
        (4, "image", b"\x89PNG\r\n\x1a\n not really", ("image/png", 1, 1, None)),  # real codec → stub skips
        (5, "image", None, ("image/x-fake", 0, 0, None)),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_decode_features(spark, media):
    out = {r["media_id"]: r for r in MM.decode_features(media).collect()}
    assert set(out) == {1, 2, 3}  # PNG + null payloads dropped by the stub
    img = out[1]
    assert (img["kind"], img["width"], img["height"], img["n_bytes"]) == ("image", 64, 48, 256)
    assert sum(img["byte_hist"]) == 256
    assert 0 <= img["mean_byte"] <= 255
    # deterministic: same seed → same features
    again = {r["media_id"]: r for r in MM.decode_features(media).collect()}
    assert again[1]["mean_byte"] == img["mean_byte"]


def test_resize(spark, media):
    out = {r["media_id"]: r for r in MM.resize(media, 16, 16).collect()}
    assert out[1]["width"] == 16 and out[1]["height"] == 16
    assert len(out[1]["payload"]) > 8


def test_sample_frames(spark, media):
    frames = MM.sample_frames(media, n_frames=4).collect()
    assert {r["media_id"] for r in frames} == {3}  # only video yields frames
    assert sorted(r["frame_no"] for r in frames) == [0, 1, 2, 3]
    total = sum(len(r["frame"]) for r in frames)
    assert total == 1024
