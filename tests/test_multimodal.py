"""Multimodal plumbing tests: schema, Arrow batch shapes, explode
semantics, partition inheritance (operators/multimodal.py). The codec
is a deterministic stub; what these tests pin down is the Spark-side
contract that survives a real-codec swap."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from cds_etl_spark.operators.multimodal import (
    FEATURES_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    extract_features,
    resize_images,
    sample_frames,
    synthetic_media,
    _decode_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    df = synthetic_media(spark, n=48, partitions=6).cache()
    df.count()
    yield df
    df.unpersist()


def test_media_schema_and_determinism(spark, media):
    assert media.schema == MEDIA_SCHEMA
    assert media.count() == 48
    # Deterministic: same id → same bytes on regeneration.
    a = {r["media_id"]: bytes(r["content"]) for r in media.collect()}
    b = {
        r["media_id"]: bytes(r["content"])
        for r in synthetic_media(spark, n=48, partitions=3).collect()
    }
    assert a == b
    # Metadata consistent with payload for images.
    for r in media.filter("kind = 'image'").collect():
        assert len(bytes(r["content"])) == r["meta"]["width"] * r["meta"]["height"]


def test_extract_features(media):
    feats = extract_features(media, dim=16)
    assert feats.schema == FEATURES_SCHEMA
    rows = feats.collect()
    assert len(rows) == 48
    for r in rows:
        assert len(r["embedding"]) == 16
        # L2-normalized histogram signature.
        assert abs(sum(x * x for x in r["embedding"]) - 1.0) < 1e-5
        assert 0.0 <= r["mean_intensity"] <= 255.0


def test_resize_images(media):
    out = resize_images(media, 16, 16)
    assert out.schema == media.schema  # shape-preserving transform
    imgs = out.filter("kind = 'image'").collect()
    assert imgs and all(len(bytes(r["content"])) == 256 for r in imgs)
    assert all(
        r["meta"]["width"] == 16 and r["meta"]["height"] == 16 for r in imgs
    )
    # Non-image rows untouched.
    aud0 = media.filter("kind = 'audio'").orderBy("media_id").first()
    aud1 = out.filter("kind = 'audio'").orderBy("media_id").first()
    assert bytes(aud0["content"]) == bytes(aud1["content"])


def test_sample_frames_explode(media):
    frames = sample_frames(media, every_k=4)
    assert frames.schema == FRAME_SCHEMA
    vids = {
        r["media_id"]: r["meta"]["n_frames"]
        for r in media.filter("kind = 'video'").collect()
    }
    got = (
        frames.groupBy("media_id").agg(F.count("*").alias("c")).collect()
    )
    counts = {r["media_id"]: r["c"] for r in got}
    # 1→N explode: exactly ceil(n_frames / 4) rows per video, none else.
    assert set(counts) == set(vids)
    for mid, nf in vids.items():
        assert counts[mid] == -(-nf // 4)


def test_unknown_format_raises(media):
    bad = media.withColumn(
        "meta", F.named_struct(
            F.lit("format"), F.lit("jpeg"),
            F.lit("width"), F.col("meta.width"),
            F.lit("height"), F.col("meta.height"),
            F.lit("sample_rate"), F.col("meta.sample_rate"),
            F.lit("n_frames"), F.col("meta.n_frames"),
        ).cast(media.schema["meta"].dataType)
    )
    # Missing codec surfaces as an explicit error, not silent garbage.
    with pytest.raises(Exception, match="no codec|NotImplemented"):
        extract_features(bad).collect()


def test_decode_stub_contract():
    arr = _decode_bytes(b"\x01\x02\x03", "fake")
    assert isinstance(arr, np.ndarray) and arr.dtype == np.uint8
    with pytest.raises(NotImplementedError):
        _decode_bytes(b"\xff", "png")
