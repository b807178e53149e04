"""Tests for multimodal plumbing (decode stubbed, Ray-side shape real)."""

import numpy as np
import pytest

import ray.data as rd

from entity_resolution__ray.stages.multimodal import (
    DecodeMedia,
    MEDIA_SCHEMA,
    ResizeImageStub,
    decode_media,
    frame_sample_stub,
    synth_media_table,
)


def test_synth_media_schema():
    t = synth_media_table(n=12)
    assert t.schema.equals(MEDIA_SCHEMA)
    assert t.num_rows == 12
    # deterministic
    assert t.equals(synth_media_table(n=12))


def test_decode_media_fake_mode(ray_session):
    media = rd.from_arrow(synth_media_table(n=30))
    out = decode_media(media, mode="fake", feature_dim=8, batch_size=8).to_pandas()
    assert len(out) == 30
    feats = np.array(out["features"].tolist())
    assert feats.shape == (30, 8)
    assert ((feats >= 0) & (feats <= 1)).all()
    # deterministic per payload: same payload → same features
    out2 = decode_media(rd.from_arrow(synth_media_table(n=30)), mode="fake").to_pandas()
    m1 = dict(zip(out["media_id"], map(tuple, out["features"])))
    m2 = dict(zip(out2["media_id"], map(tuple, out2["features"])))
    assert m1 == m2


def test_decode_media_real_mode_raises():
    with pytest.raises(NotImplementedError):
        DecodeMedia(mode="real")


def test_resize_stub(ray_session):
    media = rd.from_arrow(synth_media_table(n=6))
    out = media.map_batches(ResizeImageStub(), batch_format="pyarrow").to_pandas()
    assert (out["width"] == 224).all()
    assert (out["height"] == 224).all()


def test_frame_sample_stub(ray_session):
    media = rd.from_arrow(synth_media_table(n=9))
    frames = frame_sample_stub(media, every_ms=10_000).to_pandas()
    assert set(frames.columns) == {"media_id", "media_ref", "frame_ts_ms"}
    src = synth_media_table(n=9).to_pandas()
    vids = src[src["kind"] == "video"]
    expected = int(sum(-(-max(d, 1) // 10_000) for d in vids["duration_ms"]))
    assert len(frames) == expected
