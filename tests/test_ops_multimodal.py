"""Multimodal plumbing: schema, Arrow batch shapes, deterministic stub
decode, frame-sampling fan-out (decode itself is stubbed — no codec libs)."""

from pyspark.sql import functions as F

from singer_tap_spark.ops.multimodal import (
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    frame_sample,
    generate_media,
)


def test_media_generator_schema_and_determinism(spark):
    a = generate_media(spark, 200, seed=1)
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in MEDIA_SCHEMA.fields
    ]
    b = generate_media(spark, 200, seed=1).repartition(5)
    assert a.exceptAll(b).count() == 0
    kinds = {r["kind"] for r in a.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_stub(spark):
    media = generate_media(spark, 100)
    feats = extract_features(media, dim=16)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 100
    assert all(r["decoder"] == "stub" for r in rows)
    assert all(len(r["feature"]) == 16 for r in rows)
    # unit-norm vectors from the stub
    import math

    for r in rows[:10]:
        assert abs(math.sqrt(sum(x * x for x in r["feature"])) - 1.0) < 1e-3
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=16).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_frame_sample_fanout(spark):
    media = generate_media(spark, 150)
    frames = frame_sample(media, every_ms=5000)
    vids = media.where("kind = 'video'").select("media_id", "duration_ms").collect()
    expect = sum((v["duration_ms"] - 1) // 5000 + 1 for v in vids)
    assert frames.count() == expect
    assert frames.where(F.col("frame_ms") % 5000 != 0).count() == 0
