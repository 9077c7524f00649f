"""Multimodal plumbing: binary columns + Arrow-batched feature extraction
(decode kernels are deterministic fakes; the Spark contract is real)."""

from wiki_entity_linker_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synthetic_media,
)


def test_extract_features_schema_and_determinism(spark):
    media = synthetic_media(spark, n=30)
    out = extract_features(media)
    rows = sorted(out.collect(), key=lambda r: r["media_id"])
    assert [f.name for f in out.schema.fields] == ["media_id", "kind", "n_bytes", "feature"]
    assert len(rows) == 30
    assert all(len(r["feature"]) == 4 for r in rows)
    rows2 = sorted(extract_features(media).collect(), key=lambda r: r["media_id"])
    assert [r["feature"] for r in rows] == [r["feature"] for r in rows2]
    assert all(r["n_bytes"] > 0 for r in rows)


def test_frame_sample(spark):
    media = synthetic_media(spark, n=12)
    frames = frame_sample(media, every_n=10)
    got = frames.collect()
    assert all(r["frame_idx"] % 10 == 0 for r in got)
    assert len({r["media_id"] for r in got}) == 4  # every 3rd row is video
