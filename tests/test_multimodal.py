"""Multimodal tests: schema, Arrow batch shapes, explode semantics,
partition inheritance, and the REAL pure-numpy codecs — binary PPM/PGM
images and PCM16 WAV audio decode/encode round trips on genuine
container bytes (operators/multimodal.py). Only compressed formats
(jpeg/mp4/...) remain stubbed behind the missing-codec error."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from cds_etl_spark.operators.multimodal import (
    FEATURES_SCHEMA,
    FRAME_SCHEMA,
    MEDIA_SCHEMA,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
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
    # Images are REAL binary PPMs whose decoded shape matches metadata.
    for r in media.filter("kind = 'image'").collect():
        img = decode_ppm(bytes(r["content"]))
        assert img.shape == (r["meta"]["height"], r["meta"]["width"], 3)
    # Audio rows are REAL PCM16 WAVs carrying their sample rate.
    for r in media.filter("kind = 'audio'").limit(4).collect():
        samples, rate = decode_wav(bytes(r["content"]))
        assert rate == r["meta"]["sample_rate"] and samples.shape == (1024, 1)


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
    assert imgs and all(
        decode_ppm(bytes(r["content"])).shape == (16, 16, 3) for r in imgs
    )
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


def test_ppm_roundtrip_and_comments():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)
    # Header comments (any external netpbm writer may emit them).
    commented = b"P6\n# made by a test\n2 1\n255\n" + bytes(6)
    assert decode_ppm(commented).shape == (1, 2, 3)
    with pytest.raises(ValueError):
        decode_ppm(b"JUNK")


def test_wav_roundtrip():
    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32768, size=300).astype("<i2")
    out, rate = decode_wav(encode_wav(mono, 8000))
    assert rate == 8000 and np.array_equal(out[:, 0], mono)
    stereo = rng.integers(-32768, 32768, size=(100, 2)).astype("<i2")
    out2, rate2 = decode_wav(encode_wav(stereo, 44100))
    assert rate2 == 44100 and np.array_equal(out2, stereo)
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxNOPE")
