"""Multimodal plumbing tests: binary payload schema, batched decode
stub, deterministic features."""

import pytest

from latyas_spark.pipeline.adapter import synth_blocks
from latyas_spark.relational.multimodal import (
    extract_media_features,
    fake_decode,
    synth_media,
)


def test_fake_decode_deterministic_shape():
    r1 = fake_decode(b"abc", 8, 4)
    r2 = fake_decode(b"abc", 8, 4)
    assert r1.shape == (4, 8)
    assert (r1 == r2).all()
    assert (fake_decode(b"xyz", 8, 4) != r1).any()


def test_media_pipeline(spark, sf001_dir):
    blocks = synth_blocks(spark, sf001_dir)
    media = synth_media(blocks)
    rows = media.limit(5).collect()
    assert rows
    for r in rows:
        assert isinstance(r["payload"], (bytes, bytearray))
        assert r["media_type"] in ("image/png", "image/jpeg", "video/mp4")

    feats = extract_media_features(media)
    out = feats.collect()
    assert len(out) == media.count()
    by_ref = {r["media_ref"]: r for r in out}
    again = {r["media_ref"]: r for r in extract_media_features(media).collect()}
    for ref, r in by_ref.items():
        assert again[ref]["mean_intensity"] == r["mean_intensity"]
        assert len(r["phash"]) == 16
        assert 0.0 <= r["mean_intensity"] <= 255.0


def test_media_plan_is_arrow_batched(spark, sf001_dir):
    media = synth_media(synth_blocks(spark, sf001_dir))
    plan = (
        extract_media_features(media)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_sample_frames_kernel(spark):
    """Frame sampler: k uniform indices over n_frames, per-frame decode
    through the pluggable codec, px0 equal to a hand-computed md5 tile
    byte."""
    import hashlib

    from latyas_spark.relational.multimodal import sample_frames

    payload = b"deadbeef"
    rows = [("media://42", 8, 4, 10, payload)]
    media = spark.createDataFrame(
        rows,
        "media_ref string, width int, height int, n_frames int,"
        " payload binary",
    )
    got = sample_frames(media, k=4).toPandas().sort_values("frame_idx")
    assert list(got["frame_idx"]) == [0, 2, 5, 7]  # i*10//4
    assert (got["n_frames"] == 10).all()
    for _, r in got.iterrows():
        digest = hashlib.md5(
            payload + f":{int(r['frame_idx'])}".encode()
        ).digest()
        assert r["px0"] == digest[0]
