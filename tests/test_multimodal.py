"""Multimodal plumbing: schemas, batch shapes, vectorized kernels.

Codec work is stubbed deterministically (no media libs in the container);
everything Spark-side is real and asserted."""

import numpy as np
import pytest

from activecampaign_api_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_window_energy,
    decode_image,
    decode_images,
    image_features,
    resize_images,
    sample_frames,
)


def _media_rows():
    def img(mid, w, h):
        content = bytes(((mid * 31 + i) % 256 for i in range(w * h)))
        return (mid, "image", content, (w, h, 1, None, None, "raw"))

    def vid(mid, dur_ms, nbytes):
        content = bytes((i % 256 for i in range(nbytes)))
        return (mid, "video", content, (None, None, None, None, dur_ms, "fake"))

    def aud(mid, sr, nbytes):
        content = bytes(((i * 17) % 256 for i in range(nbytes)))
        return (mid, "audio", content, (None, None, 1, sr, None, "pcm8"))

    return [img(1, 8, 4), img(2, 16, 16), vid(10, 3500, 700), aud(20, 8000, 4000)]


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(_media_rows(), MEDIA_SCHEMA)


def test_decode_stub_deterministic_and_shaped():
    px = decode_image(bytes(range(32)), 8, 4)
    assert px.shape == (4, 8) and px[0, 0] == 0 and px[3, 7] == 31
    # short payload zero-pads
    short = decode_image(b"\x01\x02", 4, 2)
    assert short.shape == (2, 4) and short[1, 3] == 0


def test_decode_images_plumbing(spark, media):
    out = decode_images(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2}  # only kind='image'
    assert rows[1]["width"] == 8 and len(rows[1]["pixels"]) == 32
    assert rows[2]["width"] == 16 and len(rows[2]["pixels"]) == 256
    # deterministic content: pixel 0 of image 1 is (1*31+0)%256
    assert rows[1]["pixels"][0] == 31


def test_resize_nearest_neighbor(spark, media):
    dec = decode_images(media)
    res = resize_images(dec, 4, 2)
    rows = {r["media_id"]: r for r in res.collect()}
    assert all(len(r["pixels"]) == 8 for r in rows.values())
    # top-left pixel survives NN resize
    orig = {r["media_id"]: r["pixels"] for r in dec.collect()}
    assert rows[1]["pixels"][0] == orig[1][0]


def test_image_features_histogram(spark, media):
    feats = {r["media_id"]: r["features"] for r in image_features(decode_images(media)).collect()}
    for v in feats.values():
        assert len(v) == 16
        assert abs(sum(v) - 1.0) < 1e-9  # normalized
    # image 1's pixels are values 31..62 -> bins 1,2,3 hit
    assert sum(1 for x in feats[1] if x > 0) == 3


def test_sample_frames_offsets(spark, media):
    frames = sample_frames(media, every_ms=1000).collect()
    assert [r["ts_ms"] for r in frames] == [0, 1000, 2000]  # 3500ms // 1000
    assert all(r["media_id"] == 10 for r in frames)
    sizes = {len(r["frame"]) for r in frames}
    assert sizes == {700 // 3}  # even byte split (stub slicing)


def test_audio_window_energy(spark, media):
    wins = audio_window_energy(media, window_ms=250).collect()
    # 4000 bytes @8kHz = 500ms -> two 250ms windows of 2000 samples
    assert [r["window_idx"] for r in wins] == [0, 1]
    assert all(0.0 <= r["rms"] <= 1.0 for r in wins)


def test_features_feed_similarity(spark, media):
    """Media features slot into the similarity operators unchanged."""
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators.similarity import cosine_topk

    feats = image_features(decode_images(media)).select(
        F.col("media_id").alias("vec_id"),
        F.col("features").cast("array<float>").alias("embedding"),
    )
    out = cosine_topk(feats, k=1, max_query_id=2)
    assert {r["query_id"] for r in out.collect()} == {1}


def test_fused_pipeline_matches_composed(spark, media):
    from activecampaign_api_data_pipeline_spark.operators.multimodal import image_feature_pipeline

    composed = {r["media_id"]: list(r["features"])
                for r in image_features(decode_images(media)).collect()}
    fused = {r["media_id"]: list(r["features"])
             for r in image_feature_pipeline(media).collect()}
    assert fused == composed


def test_frame_dedup_pairs_planted_and_capped(spark):
    """A planted re-upload shares all frames (containment 1.0); the
    hot-frame cap drops a frame present in every video before pairing."""
    import pandas as pd
    from pyspark.sql import functions as F

    from activecampaign_api_data_pipeline_spark.operators.multimodal import frame_dedup_pairs

    rows = []
    # 10 distinct videos of 4 unique frames each, plus one common intro
    # frame shared by all; video 100 is a re-upload of video 0
    for vid in range(10):
        rows.append((vid, 0, b"intro-frame"))
        for i in range(1, 5):
            rows.append((vid, i, f"v{vid}-frame{i}".encode()))
    for idx, (vid, i, fb) in enumerate(list(rows)):
        if vid == 0 and i > 0:
            rows.append((100, i, fb))
    rows.append((100, 0, b"intro-frame"))
    frames = spark.createDataFrame(rows, "media_id long, frame_idx int, frame binary")
    out = frame_dedup_pairs(frames, min_shared=2, max_df=5).collect()
    assert len(out) == 1
    r = out[0]
    # intro frame (df=11 > 5) is capped out: 4 shared of 5 distinct frames
    assert (r["id_a"], r["id_b"]) == (0, 100)
    assert r["shared"] == 4
    assert abs(r["containment"] - 4 / 5) < 1e-9


def test_frame_dedup_pairs_leaves_no_pinned_cache(spark):
    """The shared frame-hash subtree is persisted only for the eager
    pairs materialization inside frame_dedup_pairs — after the call
    returns, no persisted RDD may remain (r6 advice: a pinned cache
    entry per invocation accumulates across bench reps)."""
    from activecampaign_api_data_pipeline_spark.operators.multimodal import frame_dedup_pairs

    sc = spark.sparkContext
    before = sc._jsc.getPersistentRDDs().size()
    rows = [(vid, i, f"v{vid}-f{i}".encode()) for vid in range(4) for i in range(3)]
    frames = spark.createDataFrame(rows, "media_id long, frame_idx int, frame binary")
    out = frame_dedup_pairs(frames, min_shared=2, max_df=10)
    out.collect()
    # exactly ONE persisted RDD may remain: the localCheckpoint of the
    # tiny pairs result (freed by the ContextCleaner when the returned
    # frame is GC'd). The large frame-hash postings subtree must be gone.
    assert sc._jsc.getPersistentRDDs().size() <= before + 1
