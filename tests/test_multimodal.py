"""Tests for multimodal plumbing (decode stubbed, Ray-side shape real)."""

import numpy as np
import pyarrow as pa
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


def test_decode_media_real_mode_gates_per_format():
    # real mode decodes PPM/BMP/WAV for real; formats that genuinely need
    # PIL/ffmpeg (e.g. PNG) raise NotImplementedError, and a corrupt stream
    # of a SUPPORTED container raises ValueError, not NotImplementedError
    dm = DecodeMedia(mode="real")
    with pytest.raises(NotImplementedError):
        dm._real_features(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        dm._real_features(b"RIFF....WAVE")  # RIFF/WAVE magic but no chunks


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


def test_ppm_codec_roundtrip():
    from entity_resolution__ray.stages.multimodal import decode_ppm, encode_ppm, resize_nearest

    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(arr)) == arr).all()
    # header comments are skipped
    with_comment = b"P6\n# a comment\n13 9\n255\n" + arr.tobytes()
    assert (decode_ppm(with_comment) == arr).all()
    out = resize_nearest(arr, 4, 6)
    assert out.shape == (6, 4, 3)
    # constant image stays constant under resize
    const = np.full((5, 5, 3), 77, dtype=np.uint8)
    assert (resize_nearest(const, 9, 2) == 77).all()


def test_real_decode_ppm_images(ray_session):
    from entity_resolution__ray.stages.multimodal import decode_media, synth_media_table

    import pyarrow.compute as pc2
    import ray.data as rd2

    media = rd2.from_arrow(synth_media_table(24))
    images = media.map_batches(
        lambda t: t.filter(pc2.equal(t["kind"], "image")), batch_format="pyarrow"
    )
    out = decode_media(images, mode="real").to_pandas()
    assert len(out) == 8
    feats = np.array(out["features"].tolist())
    assert feats.shape == (8, 8)
    assert np.isfinite(feats).all()
    # mean channels of uniform-random pixels land near 0.5
    assert 0.3 < feats[:, 0].mean() < 0.7


def test_real_decode_raises_for_unknown_format(ray_session):
    from entity_resolution__ray.stages.multimodal import DecodeMedia

    dm = DecodeMedia(mode="real")
    with pytest.raises(NotImplementedError):
        dm._real_features(b"\x00\x01\x02")


def test_bmp_codec_roundtrip():
    from entity_resolution__ray.stages.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(7)
    # widths that exercise 0-3 bytes of row padding
    for w in (5, 6, 7, 8):
        arr = rng.randint(0, 256, size=(4, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(arr)) == arr).all()
    with pytest.raises(ValueError):
        decode_bmp(b"BMtooshort")
    with pytest.raises(ValueError):
        decode_bmp(b"P6\n1 1\n255\n\x00\x00\x00")


def test_wav_codec_roundtrip_and_features():
    from entity_resolution__ray.stages.multimodal import decode_wav, encode_wav, wav_features

    rate = 8000
    t = np.arange(rate // 4)  # 250 ms
    mono = 0.5 * np.sin(2 * np.pi * 440 * t / rate)
    x, r = decode_wav(encode_wav(mono, rate))
    assert r == rate
    assert x.shape == (len(t), 1)
    assert np.abs(x[:, 0] - mono).max() < 1e-3  # 16-bit quantization
    stereo = np.stack([mono, -mono], axis=1)
    x2, _ = decode_wav(encode_wav(stereo, rate))
    assert x2.shape == (len(t), 2)
    f = wav_features(x, r)
    assert f.shape == (8,)
    assert np.isfinite(f).all()
    assert 0.3 < f[1] / 0.5 * np.sqrt(2) < 1.2  # RMS of a 0.5-amp sine ≈ 0.354
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE")


def test_real_decode_wav_audio_rows(ray_session):
    import pyarrow.compute as pc2

    from entity_resolution__ray.stages.multimodal import decode_media, synth_media_table

    media = rd.from_arrow(synth_media_table(24))
    audio = media.map_batches(
        lambda t: t.filter(pc2.equal(t["kind"], "audio")), batch_format="pyarrow"
    )
    out = decode_media(audio, mode="real").to_pandas()
    assert len(out) == 8
    feats = np.array(out["features"].tolist())
    assert feats.shape == (8, 8)
    assert np.isfinite(feats).all()
    assert (feats[:, 1] > 0.1).all()  # sine RMS well above silence


def test_resize_stage_rewrites_image_payloads(ray_session):
    from entity_resolution__ray.stages.multimodal import (
        ResizeImageStub,
        decode_bmp,
        decode_ppm,
        synth_media_table,
    )

    t = synth_media_table(12)  # images alternate PPM / BMP payloads
    out = ResizeImageStub(target_w=10, target_h=7)(t)
    magics = set()
    for p, k in zip(out["payload"].to_pylist(), out["kind"].to_pylist()):
        if k == "image":
            dec = decode_ppm if p.startswith(b"P6") else decode_bmp
            magics.add(p[:2])
            assert dec(p).shape == (7, 10, 3)
    assert magics == {b"P6", b"BM"}  # both codecs exercised
    assert set(out["width"].to_pylist()) == {10}


def test_image_pixel_stats_exact(ray_session):
    import ray.data as rd

    from entity_resolution__ray.stages.multimodal import (
        encode_bmp,
        encode_ppm,
        image_pixel_stats,
    )

    rng = np.random.RandomState(17)
    imgs = [rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
            for h, w in [(3, 4), (8, 5), (1, 1), (6, 6)]]
    payloads = [encode_ppm(a) if i % 2 == 0 else encode_bmp(a) for i, a in enumerate(imgs)]
    media = rd.from_arrow(pa.table({
        "media_id": [f"m{i}" for i in range(len(imgs))],
        "payload": pa.array(payloads, pa.binary()),
    }))
    out = image_pixel_stats(media).to_pandas().sort_values("media_id").reset_index(drop=True)
    for i, a in enumerate(imgs):
        assert out.loc[i, "height"] == a.shape[0]
        assert out.loc[i, "width"] == a.shape[1]
        assert out.loc[i, "pixel_sum"] == int(a.astype(np.int64).sum())


def test_image_pixel_stats_rejects_unknown_encoding(ray_session):
    import pytest as _pytest
    import ray.data as rd
    from ray.exceptions import RayTaskError

    from entity_resolution__ray.stages.multimodal import image_pixel_stats

    media = rd.from_arrow(pa.table({
        "media_id": ["m0"], "payload": pa.array([b"\x89PNG...."], pa.binary()),
    }))
    with _pytest.raises((NotImplementedError, RayTaskError)):
        image_pixel_stats(media).materialize()
