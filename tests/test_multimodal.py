"""Multimodal plumbing + pure-numpy decode kernels.

PPM (P6) and WAV PCM-16 decode are REAL (value-tested against the payload
generators); compressed formats fall back to deterministic byte-stats
(gated on codec libs, absent in this container)."""

import numpy as np
import pytest

from wiki_entity_linker_spark.operators.multimodal import (
    decode_ppm_p6,
    decode_wav_pcm16,
    extract_features,
    frame_sample,
    make_ppm,
    make_wav_pcm16,
    resize_nearest,
    synthetic_media,
)


def test_extract_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=30)
    out = extract_features(media)
    rows = sorted(out.collect(), key=lambda r: r["media_id"])
    assert [f.name for f in out.schema.fields] == ["media_id", "kind", "n_bytes", "feature"]
    assert len(rows) == 30
    # real decodes: images → 6-dim, audio/video-fallback → 4-dim
    by_kind = {r["media_id"]: r for r in rows}
    assert all(
        len(r["feature"]) == (6 if r["kind"] == "image" else 4) for r in rows
    ), by_kind
    rows2 = sorted(extract_features(media).collect(), key=lambda r: r["media_id"])
    assert [r["feature"] for r in rows] == [r["feature"] for r in rows2]
    assert all(r["n_bytes"] > 0 for r in rows)


def test_ppm_roundtrip_exact():
    rng = np.random.RandomState(0)
    buf = make_ppm(5, 3, rng)
    img = decode_ppm_p6(buf)
    assert img is not None and img.shape == (3, 5, 3)
    # regenerate with the same seed: bytes → pixels is exact
    pixels = np.random.RandomState(0).randint(0, 256, size=(3, 5, 3), dtype=np.uint8)
    assert (img == pixels).all()
    # comments + arbitrary header whitespace per the spec
    with_comment = b"P6 # a comment\n# another\n5\t3\n255\n" + img.tobytes()
    assert (decode_ppm_p6(with_comment) == pixels).all()
    assert decode_ppm_p6(b"JFIF....") is None
    assert decode_ppm_p6(b"P6\n5 3\n255\n\x00") is None  # truncated


def test_wav_roundtrip_exact():
    rng = np.random.RandomState(1)
    buf = make_wav_pcm16(100, 8000, rng)
    got = decode_wav_pcm16(buf)
    assert got is not None
    samples, rate = got
    assert rate == 8000 and len(samples) == 100
    want = (np.random.RandomState(1).standard_normal(100) * 3000).astype("<i2")
    assert (samples == want).all()
    assert decode_wav_pcm16(b"OggS....") is None


def test_resize_nearest():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    small = resize_nearest(img, 2, 3)
    assert small.shape == (2, 3)
    assert (small == img[[0, 2]][:, [0, 2, 4]]).all()
    # upscale repeats pixels, never interpolates
    up = resize_nearest(img, 8, 6)
    assert up.shape == (8, 6) and set(np.unique(up)) <= set(np.unique(img))


def test_image_feature_values(spark):
    """The distributed path must agree with a local decode of the same
    payload (mapInPandas is plumbing, not arithmetic)."""
    media = synthetic_media(spark, n=3)  # m0000 is an image
    row = {r["media_id"]: r for r in extract_features(media).collect()}["m0000"]
    buf = {r["media_id"]: bytes(r["data"]) for r in media.collect()}["m0000"]
    img = decode_ppm_p6(buf)
    assert row["feature"][0] == img.shape[1] and row["feature"][1] == img.shape[0]
    assert row["feature"][2] == pytest.approx(img[..., 0].mean(), abs=1e-3)


def test_frame_sample(spark):
    media = synthetic_media(spark, n=12)
    frames = frame_sample(media, every_n=10)
    got = frames.collect()
    assert all(r["frame_idx"] % 10 == 0 for r in got)
    assert len({r["media_id"] for r in got}) == 4  # every 3rd row is video


def test_wav_malformed_degrades_to_none():
    """Corrupt RIFF buffers must return None (fallback path), never raise —
    one bad file cannot kill the extract_features stage."""
    rng = np.random.RandomState(2)
    good = make_wav_pcm16(64, 8000, rng)
    # declared data size beyond the buffer with an odd remainder
    bad_data = good[:40] + b"data" + (100).to_bytes(4, "little") + b"\x01" * 33
    # truncated fmt chunk
    bad_fmt = (b"RIFF" + (38).to_bytes(4, "little") + b"WAVE"
               + b"fmt " + (14).to_bytes(4, "little") + b"\x01" * 14
               + b"data" + (4).to_bytes(4, "little") + b"\x00" * 4)
    from wiki_entity_linker_spark.operators.multimodal import _decode_any

    # structurally-invalid fmt → None
    assert decode_wav_pcm16(bad_fmt) is None
    # data chunks whose declared size overruns the buffer (odd or empty
    # remainder) degrade to clamped even-length samples — and must not raise
    for buf in (bad_data, good[:45]):
        got = decode_wav_pcm16(buf)  # no exception is the contract
        assert got is None or isinstance(got[1], int)
    for buf in (bad_data, bad_fmt, good[:45]):
        assert len(_decode_any(buf)) == 4  # never crashes the stage
