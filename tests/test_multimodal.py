"""Multimodal plumbing: resize round-trip, frame sampling, audio features."""

import numpy as np

from sparkclean import synth
from sparkclean.images import codec
from sparkclean.images.multimodal import audio_features, resize_images, sample_video_frames


def test_resize_images(spark):
    corpus = synth.synth_images(spark, 50, with_images=True, partitions=2)
    out = resize_images(corpus, 16, 24).collect()
    assert len(out) == 50
    for r in out:
        assert r["w"] == 16 and r["h"] == 24
        px, fmt = codec.decode(bytes(r["bytes"]))
        assert px.shape == (24, 16, 3)
    # deterministic: same input → same bytes
    out2 = {r["image_id"]: bytes(r["bytes"]) for r in resize_images(corpus, 16, 24).collect()}
    for r in out:
        assert out2[r["image_id"]] == bytes(r["bytes"])


def test_sample_video_frames(spark):
    vids = spark.createDataFrame([(f"vid_{i}",) for i in range(10)], "video_id: string")
    frames = sample_video_frames(vids, n_frames=4).collect()
    assert len(frames) == 40
    by_vid = {}
    for f in frames:
        by_vid.setdefault(f["video_id"], []).append(f)
    for v, fs in by_vid.items():
        assert sorted(x["frame_index"] for x in fs) == [0, 1, 2, 3]
        assert all(0.0 <= x["frame_ts"] <= 1.0 for x in fs)
        assert all(np.isfinite(x["brightness"]) for x in fs)


def test_audio_features(spark):
    clips = spark.createDataFrame([(f"aud_{i}",) for i in range(8)], "audio_id: string")
    out = audio_features(clips).collect()
    assert len(out) == 8
    for r in out:
        assert r["n_samples"] == 8000
        assert 0.0 < r["rms"] <= r["peak"] <= 0.5 + 1e-9
        assert 0.0 < r["zero_crossing_rate"] < 1.0
