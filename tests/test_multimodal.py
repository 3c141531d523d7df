"""Multimodal plumbing tests: real Spark schema/batch path, fake decode
backend, stubbed real backend surfaces as error rows (never exceptions)."""

from __future__ import annotations

from ocr_award_extractor_spark.operators.multimodal import (
    extract_media_features, make_fake_image, make_fake_video,
)


def test_media_feature_extraction(spark):
    rows = [
        ("img1", "fake_image", make_fake_image(4, 3, seed=1)),
        ("img2", "fake_image", make_fake_image(8, 2, seed=2)),
        ("vid1", "fake_video", make_fake_video(6, 10, seed=3)),
        ("bad1", "fake_image", b"FAKEIMG:4:3:xx"),        # truncated pixels
        ("real", "image", b"\x89PNG\r\n fake png bytes"),  # stubbed backend
    ]
    media = spark.createDataFrame(rows, "url string, kind string, payload binary")
    got = {r["url"]: r for r in extract_media_features(media).collect()}

    assert got["img1"]["status"] == "success"
    assert (got["img1"]["width"], got["img1"]["height"]) == (4, 3)
    assert 0.0 <= got["img1"]["mean_intensity"] <= 255.0
    assert got["vid1"]["n_frames"] == 6
    assert got["bad1"]["status"] == "error" and "truncated" in got["bad1"]["message"]
    assert got["real"]["status"] == "error" and "not in this" in got["real"]["message"]
    assert len(got) == 5


def test_media_deterministic_across_partitions(spark):
    rows = [(f"u{i}", "fake_image", make_fake_image(5, 5, seed=i)) for i in range(20)]
    media = spark.createDataFrame(rows, "url string, kind string, payload binary")
    a = sorted(map(tuple, extract_media_features(media.repartition(1)).collect()))
    b = sorted(map(tuple, extract_media_features(media.repartition(7)).collect()))
    assert a == b
