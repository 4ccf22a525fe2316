"""Perceptual-hash image dedup and audio signal features
(operators/multimodal.py round-6 additions).

pHash contract: identical pixels → identical hash regardless of the
container format; perceptually-near images (noise, brightness) →
small Hamming distance; unrelated images → large. The Hamming banding
join has GUARANTEED recall for max_hamming < n_bands (pigeonhole) —
property-tested against brute force.
"""

import numpy as np
import pandas as pd
import pytest

from cds_etl_spark.operators.multimodal import (
    AUDIO_FEATURES_SCHEMA,
    MEDIA_SCHEMA,
    PHASH_SCHEMA,
    encode_png,
    encode_ppm,
    encode_wav,
    extract_audio_features,
    hamming_near_dup,
    phash64,
    phash_images,
    synthetic_media,
)


def _img(seed: int, h: int = 48, w: int = 64) -> np.ndarray:
    # Low-frequency content (what pHash keys on): smooth gradient +
    # seeded blobs, so distinct seeds give genuinely different spectra.
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        96
        + 64 * np.sin(2 * np.pi * xx / w * rng.integers(1, 4))
        + 48 * np.cos(2 * np.pi * yy / h * rng.integers(1, 5))
    )
    return np.clip(base + rng.normal(0, 4, size=(h, w)), 0, 255).astype(
        np.uint8
    )


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_phash_deterministic_and_format_independent():
    img = np.stack([_img(1)] * 3, axis=2)
    h_ppm = phash64(img)
    h_again = phash64(img)
    assert h_ppm == h_again
    # Same pixels through different lossless containers → same hash.
    from cds_etl_spark.operators.multimodal import decode_png, decode_ppm

    assert phash64(decode_ppm(encode_ppm(img))) == h_ppm
    assert phash64(decode_png(encode_png(img))) == h_ppm


def test_phash_brightness_invariance_and_noise_tolerance():
    img = _img(7).astype(np.int32)
    h0 = phash64(img.astype(np.uint8))
    brighter = np.clip(img + 30, 0, 255).astype(np.uint8)
    assert _hamming(h0, phash64(brighter)) <= 6
    rng = np.random.default_rng(0)
    noisy = np.clip(img + rng.integers(-3, 4, img.shape), 0, 255).astype(
        np.uint8
    )
    assert _hamming(h0, phash64(noisy)) <= 6


def test_phash_separates_unrelated_images():
    hashes = [phash64(_img(s)) for s in range(2, 12)]
    dists = [
        _hamming(a, b)
        for i, a in enumerate(hashes)
        for b in hashes[i + 1 :]
    ]
    # Unrelated low-frequency spectra: comfortably past any dedup
    # threshold (<=6 above); median should sit near 32.
    assert min(dists) > 8


def test_phash_images_dataframe(spark, tmp_path):
    media = synthetic_media(spark, n=24, partitions=4)
    sigs = phash_images(media)
    assert sigs.schema == PHASH_SCHEMA
    rows = {r["media_id"]: r["phash"] for r in sigs.collect()}
    # Only image rows hashed; deterministic across re-runs.
    kinds = {r["media_id"]: r["kind"] for r in media.collect()}
    assert set(rows) == {m for m, k in kinds.items() if k == "image"}
    again = {r["media_id"]: r["phash"] for r in phash_images(media).collect()}
    assert rows == again


def test_hamming_near_dup_pigeonhole_guarantee(spark):
    # Brute-force vs banded join on a planted signature set: every
    # pair within max_hamming MUST surface (pigeonhole recall), and
    # nothing beyond the threshold may.
    rng = np.random.default_rng(42)
    base = [int(rng.integers(-(2**63), 2**63 - 1)) for _ in range(30)]
    sigs = []
    for i, h in enumerate(base):
        sigs.append((i * 10, h))
        # Planted near-dup: flip <=3 random bits.
        flipped = h
        for b in rng.choice(64, size=int(rng.integers(0, 4)), replace=False):
            flipped ^= 1 << int(b)
        flipped = int(np.int64(np.uint64(flipped & 0xFFFFFFFFFFFFFFFF)))
        sigs.append((i * 10 + 1, flipped))
    df = spark.createDataFrame(sigs, ["media_id", "phash"])
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_dup(df, max_hamming=3).collect()
    }
    expect = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            d = _hamming(sigs[i][1], sigs[j][1])
            if d <= 3:
                a, b = sorted((sigs[i][0], sigs[j][0]))
                expect.add((a, b, d))
    assert got == expect
    assert expect  # the plant produced at least some pairs


def test_phash_end_to_end_near_dup(spark):
    # Real codec path: original + noisy copy as PPM rows → the pair is
    # found; unrelated images are not paired.
    rng = np.random.default_rng(5)
    rows = []
    for i in range(6):
        img = np.stack([_img(i + 20)] * 3, axis=2)
        rows.append((i, "image", bytearray(encode_ppm(img)),
                     ("ppm", img.shape[1], img.shape[0], 0, 1)))
        if i == 0:
            noisy = np.clip(
                img.astype(np.int32) + rng.integers(-2, 3, img.shape), 0, 255
            ).astype(np.uint8)
            rows.append((100, "image", bytearray(encode_ppm(noisy)),
                         ("ppm", img.shape[1], img.shape[0], 0, 1)))
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = hamming_near_dup(phash_images(media), max_hamming=6).collect()
    assert {(p["id_a"], p["id_b"]) for p in pairs} == {(0, 100)}


def test_audio_features_sine_and_silence(spark):
    rate = 8000
    t = np.arange(rate)  # 1 s
    sine = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2")
    half_silent = np.concatenate([sine, np.zeros(rate, dtype="<i2")])
    quiet = np.zeros(rate, dtype="<i2")
    rows = [
        (1, "audio", bytearray(encode_wav(sine, rate)),
         ("wav", 0, 0, rate, 1)),
        (2, "audio", bytearray(encode_wav(half_silent, rate)),
         ("wav", 0, 0, rate, 1)),
        (3, "audio", bytearray(encode_wav(quiet, rate)),
         ("wav", 0, 0, rate, 1)),
        (4, "image", bytearray(b"not audio"), ("ppm", 1, 1, 0, 1)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_audio_features(df)
    assert feats.schema == AUDIO_FEATURES_SCHEMA
    by_id = {r["media_id"]: r for r in feats.collect()}
    assert set(by_id) == {1, 2, 3}  # image row never decoded
    s = by_id[1]
    assert s["sample_rate"] == rate and s["n_samples"] == rate
    assert abs(s["duration_s"] - 1.0) < 1e-6
    # Sine at amplitude 0.5: RMS = 0.5/sqrt(2) ~ 0.354.
    assert abs(s["rms"] - 0.3536) < 0.01
    # 440 Hz crosses zero 880 times/s → ZCR ~ 880/8000 = 0.11.
    assert abs(s["zero_cross_rate"] - 0.11) < 0.01
    assert s["silence_frac"] == 0.0
    assert abs(by_id[2]["silence_frac"] - 0.5) < 0.02
    assert by_id[3]["silence_frac"] == 1.0 and by_id[3]["rms"] == 0.0


def test_audio_features_stereo_counts_frames_not_samples(spark):
    # A stereo clip must report FRAME counts: n_samples = frames (not
    # frames x channels), duration unchanged vs its mono mix, and the
    # framed silence computation must not blow up on the 2-D layout.
    rate = 8000
    t = np.arange(rate)  # 1 s
    left = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2")
    stereo = np.stack([left, left], axis=1)  # identical channels
    rows = [
        (1, "audio", bytearray(encode_wav(left, rate)),
         ("wav", 0, 0, rate, 1)),
        (2, "audio", bytearray(encode_wav(stereo, rate)),
         ("wav", 0, 0, rate, 2)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    by_id = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    mono, st = by_id[1], by_id[2]
    assert st["n_samples"] == rate  # frames, not 2*rate
    assert abs(st["duration_s"] - 1.0) < 1e-6
    # Identical channels -> the mono mix is the same signal: every
    # feature matches the mono clip exactly.
    for f in ["rms", "zero_cross_rate", "silence_frac"]:
        assert abs(st[f] - mono[f]) < 1e-6


def test_bands_for_rejects_guarantee_breaking_distance(spark):
    from cds_etl_spark.operators.multimodal import _bands_for

    assert _bands_for(3) == 4 and _bands_for(15) == 16
    with pytest.raises(ValueError, match="pigeonhole"):
        _bands_for(16)
    # The join-level entry points inherit the guard.
    sigs = spark.createDataFrame([(1, 7)], ["media_id", "phash"])
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_near_dup(sigs, max_hamming=16)


def test_phash_index_build_append_probe(spark, tmp_path):
    # In-memory banded join and persisted-index probe must agree, and
    # append must extend the standing index.
    rng = np.random.default_rng(9)
    sigs1 = [(i, int(rng.integers(-(2**63), 2**63 - 1))) for i in range(20)]
    df1 = spark.createDataFrame(sigs1, ["media_id", "phash"])
    from cds_etl_spark.operators.multimodal import (
        build_phash_index,
        probe_phash_index,
    )

    idx = str(tmp_path / "phidx")
    build_phash_index(df1, idx)
    # A probe batch: one planted near-dup of id 0, one exact dup of id
    # 3, one unrelated.
    near = sigs1[0][1] ^ (1 << 17) ^ (1 << 42)
    batch = spark.createDataFrame(
        [(100, int(np.int64(np.uint64(near & 0xFFFFFFFFFFFFFFFF)))),
         (101, sigs1[3][1]),
         (102, int(rng.integers(-(2**63), 2**63 - 1)))],
        ["media_id", "phash"],
    )
    pairs = {
        (r["new_id"], r["index_id"], r["hamming"])
        for r in probe_phash_index(spark, batch, idx, max_hamming=3).collect()
    }
    assert (100, 0, 2) in pairs and (101, 3, 0) in pairs
    assert all(p[0] != 102 for p in pairs)
    # Append the batch; a re-probe of the near-dup now also matches the
    # appended row itself (hamming 0).
    build_phash_index(batch, idx, mode="append")
    re = probe_phash_index(spark, batch.limit(1), idx, max_hamming=3)
    got = {(r["new_id"], r["index_id"]) for r in re.collect()}
    assert (100, 100) in got and (100, 0) in got


def test_stream_media_ingest_with_index(spark, tmp_path):
    """Continuous image ingest: within-batch perceptual dup collapses,
    cross-batch dup is dropped by the INDEX probe (no in-memory
    state), blanks are gated, and the index accumulates signatures."""
    from cds_etl_spark.streaming.ops import stream_media_ingest_with_index

    rng = np.random.default_rng(3)

    def row(mid, img):
        return (mid, "image", bytearray(encode_ppm(img)),
                ("ppm", img.shape[1], img.shape[0], 0, 1))

    base = {s: np.stack([_img(s + 50)] * 3, axis=2) for s in range(3)}

    def noisy(img):
        return np.clip(
            img.astype(np.int32) + rng.integers(-2, 3, img.shape), 0, 255
        ).astype(np.uint8)

    blank = np.full((32, 32, 3), 128, dtype=np.uint8)
    b1 = spark.createDataFrame(
        [row(1, base[0]), row(2, noisy(base[0])),  # within-batch dup pair
         row(3, base[1]), row(4, blank)],
        MEDIA_SCHEMA,
    )
    b2 = spark.createDataFrame(
        [row(11, noisy(base[0])),  # cross-batch dup of 1 (via index)
         row(12, base[2])],        # genuinely new
        MEDIA_SCHEMA,
    )
    src = str(tmp_path / "media_inbox")
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(MEDIA_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    out = str(tmp_path / "media_out")
    idx = str(tmp_path / "media_idx")
    stream_media_ingest_with_index(
        stream, idx, out, str(tmp_path / "media_ckpt"), max_hamming=6
    )
    kept = {r["media_id"] for r in spark.read.parquet(out).collect()}
    # 2 lost within-batch, 4 gated as blank, 11 lost to the index.
    assert kept == {1, 3, 12}, kept
    indexed = {r["media_id"] for r in spark.read.parquet(idx).collect()}
    assert indexed == {1, 3, 12}, indexed
    # r14: the loop's stats must describe ITS probe banding
    # (max_hamming=6 -> _bands_for(6)), so the hot-band guard is
    # armable in-stream instead of warning 'stats unusable' per batch.
    from cds_etl_spark.operators.multimodal import _bands_for

    stats = spark.read.parquet(f"{idx}/_band_stats")
    assert stats.select("n_bands").distinct().collect()[0][0] == _bands_for(6)


def test_image_quality_features(spark):
    """Sharp random-texture image scores high sharpness; its box-
    blurred copy scores much lower; a flat image has ~zero contrast,
    sharpness and entropy."""
    from cds_etl_spark.operators.multimodal import (
        IMAGE_QUALITY_SCHEMA,
        image_quality_features,
    )

    rng = np.random.default_rng(21)
    sharp = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    # Blur via repeated 4-neighbor averaging (4 passes ~ gaussian;
    # pure numpy, no scipy).
    b = sharp.astype(np.float64)
    for _ in range(4):
        b = (
            b
            + np.roll(b, 1, 0) + np.roll(b, -1, 0)
            + np.roll(b, 1, 1) + np.roll(b, -1, 1)
        ) / 5.0
    blurred = np.clip(b, 0, 255).astype(np.uint8)
    flat = np.full((64, 64, 3), 200, dtype=np.uint8)
    rows = [
        (1, "image", bytearray(encode_ppm(sharp)), ("ppm", 64, 64, 0, 1)),
        (2, "image", bytearray(encode_ppm(blurred)), ("ppm", 64, 64, 0, 1)),
        (3, "image", bytearray(encode_ppm(flat)), ("ppm", 64, 64, 0, 1)),
        (4, "audio", bytearray(b"x"), ("wav", 0, 0, 8000, 1)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = image_quality_features(df)
    assert feats.schema == IMAGE_QUALITY_SCHEMA
    by_id = {r["media_id"]: r for r in feats.collect()}
    assert set(by_id) == {1, 2, 3}
    assert by_id[1]["sharpness"] > 10 * by_id[2]["sharpness"]
    assert by_id[3]["contrast"] == 0.0 and by_id[3]["sharpness"] == 0.0
    assert by_id[3]["gray_entropy"] == 0.0
    assert by_id[1]["gray_entropy"] > 6.0  # near-uniform histogram
    assert abs(by_id[3]["brightness"] - 200.0) < 1e-6


def test_spectral_features_sine_ground_truth(spark):
    from cds_etl_spark.operators.multimodal import extract_spectral_features

    rate = 8000
    t = np.arange(2 * rate)
    tone = (0.6 * 32767 * np.sin(2 * np.pi * 440 * t / rate)).astype("<i2")
    hiss_rng = np.random.default_rng(4)
    hiss = (hiss_rng.uniform(-0.3, 0.3, 2 * rate) * 32767).astype("<i2")
    rows = [
        (1, "audio", bytearray(encode_wav(tone, rate)), ("wav", 0, 0, rate, 1)),
        (2, "audio", bytearray(encode_wav(hiss, rate)), ("wav", 0, 0, rate, 1)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    by_id = {r["media_id"]: r for r in extract_spectral_features(df).collect()}
    # Pure 440 Hz tone: dominant bin lands on 440, centroid ~440,
    # nothing above 4 kHz.
    assert abs(by_id[1]["dominant_freq_hz"] - 440.0) < 1.0
    assert abs(by_id[1]["spectral_centroid_hz"] - 440.0) < 5.0
    assert by_id[1]["high_freq_ratio"] < 0.01
    # White-ish noise: centroid near band middle (~2 kHz for 4 kHz
    # Nyquist), energy above 4 kHz substantial... (Nyquist here is
    # 4 kHz, so high_freq_ratio ~ 0 by construction — use centroid.)
    assert 1500 < by_id[2]["spectral_centroid_hz"] < 2500


def test_compact_phash_index_equivalence(spark, tmp_path):
    """Double-append then compact: row count collapses, probe results
    are identical against original and compacted index."""
    from cds_etl_spark.operators.multimodal import (
        build_phash_index,
        compact_phash_index,
        probe_phash_index,
    )

    rng = np.random.default_rng(13)
    sigs = spark.createDataFrame(
        [(i, int(rng.integers(-(2**63), 2**63 - 1))) for i in range(25)],
        ["media_id", "phash"],
    )
    idx = str(tmp_path / "cidx")
    build_phash_index(sigs, idx)
    build_phash_index(sigs, idx, mode="append")  # crash-replay shape
    assert spark.read.parquet(idx).count() == 50
    out = str(tmp_path / "cidx2")
    compact_phash_index(spark, idx, out)
    assert spark.read.parquet(out).count() == 25
    batch = sigs.limit(5)
    a = {tuple(r) for r in probe_phash_index(spark, batch, idx).collect()}
    b = {tuple(r) for r in probe_phash_index(spark, batch, out).collect()}
    assert a == b and len(a) >= 5


def test_detect_scene_cuts(spark):
    """Planted two-shot video: constant dark frames, then constant
    bright frames — exactly one cut, at the shot boundary, through
    the REAL mp4 container path and the fake-payload path alike."""
    from cds_etl_spark.operators.mp4 import encode_mp4
    from cds_etl_spark.operators.multimodal import detect_scene_cuts

    w = h = 16
    dark = np.full(w * h, 10, dtype=np.uint8).tobytes()
    bright = np.full(w * h, 200, dtype=np.uint8).tobytes()
    frames = [dark] * 4 + [bright] * 4
    rows = [
        (1, "video", bytearray(encode_mp4(frames, w, h)),
         ("mp4", w, h, 0, 8)),
        (2, "video", bytearray(b"".join(frames)), ("fake", w, h, 0, 8)),
        (3, "image", bytearray(b"zz"), ("ppm", 1, 1, 0, 1)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = detect_scene_cuts(df, threshold=30.0).collect()
    for mid in (1, 2):
        cuts = sorted(
            r["frame_idx"] for r in out
            if r["media_id"] == mid and r["is_cut"] == "cut"
        )
        assert cuts == [4], (mid, cuts)
        runs = [r for r in out if r["media_id"] == mid and r["is_cut"] == "run"]
        assert len(runs) == 6 and all(r["frame_diff"] == 0.0 for r in runs)
    assert not any(r["media_id"] == 3 for r in out)


def _melody(seed: int, rate: int = 8000, notes: int = 8) -> np.ndarray:
    # A deterministic "song": a sequence of distinct notes (plus one
    # harmonic each) with seed-varied durations, so the spectrogram
    # has clear, time-varying peaks — the structure landmark
    # fingerprints key on — and unrelated seeds don't share a note
    # grid.
    rng = np.random.default_rng(seed)
    freqs = rng.choice(np.arange(300, 2400, 37), size=notes, replace=False)
    segs = []
    for f in freqs:
        n = int(rate * rng.choice([0.17, 0.21, 0.25, 0.29]))
        t = np.arange(n)
        segs.append(
            0.4 * np.sin(2 * np.pi * f * t / rate)
            + 0.2 * np.sin(2 * np.pi * 2 * f * t / rate)
        )
    x = np.concatenate(segs)
    return (32767 * 0.8 * x / np.max(np.abs(x))).astype("<i2")


def test_audio_fingerprint_match_planted_duplicate(spark):
    from cds_etl_spark.operators.multimodal import (
        audio_fingerprints,
        match_audio_fingerprints,
    )

    rate = 8000
    song = _melody(1)
    # Duplicate: 60 % gain + 2048 samples (8 hops) of leading silence.
    dup = np.concatenate(
        [np.zeros(2048, dtype="<i2"), (0.6 * song).astype("<i2")]
    )
    rows = [
        (1, "audio", bytearray(encode_wav(song, rate)), ("wav", 0, 0, rate, 1)),
        (2, "audio", bytearray(encode_wav(dup, rate)), ("wav", 0, 0, rate, 1)),
        (3, "audio", bytearray(encode_wav(_melody(2), rate)), ("wav", 0, 0, rate, 1)),
        (4, "audio", bytearray(encode_wav(_melody(3), rate)), ("wav", 0, 0, rate, 1)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    fps = audio_fingerprints(df)
    # Deterministic: two runs produce identical hash multisets.
    s1 = sorted((r["media_id"], r["fp_hash"], r["t"]) for r in fps.collect())
    s2 = sorted((r["media_id"], r["fp_hash"], r["t"]) for r in fps.collect())
    assert s1 == s2 and len(s1) > 50
    matches = match_audio_fingerprints(fps, min_votes=40).collect()
    pairs = {(r["id_a"], r["id_b"]): r for r in matches}
    # The planted pair — and ONLY it — matches, at the planted offset
    # (8 hops of leading silence; sign depends on id order).
    assert set(pairs) == {(1, 2)}
    m = pairs[(1, 2)]
    assert abs(m["offset"]) == 8
    assert m["votes"] >= 40
    # The hot-hash prune leaves a selective corpus untouched.
    pruned = match_audio_fingerprints(
        fps, min_votes=40, max_hash_clips=3
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in pruned} == {(1, 2)}


def test_probe_phash_hot_band_guard(spark, tmp_path):
    """r12 index skew audit, pHash flavor: k copies of one template
    hash share every (band, chunk) key; max_band_entries drops those
    index bands while distinct near-dups keep matching."""
    from cds_etl_spark.operators.multimodal import (
        build_phash_index,
        probe_phash_index,
    )

    rng = np.random.default_rng(4)
    hot = int(rng.integers(-(2**63), 2**63 - 1))
    sigs = [(i, hot) for i in range(12)] + [
        (100 + i, int(rng.integers(-(2**63), 2**63 - 1))) for i in range(6)
    ]
    idx = str(tmp_path / "hotph")
    build_phash_index(spark.createDataFrame(sigs, ["media_id", "phash"]), idx)
    near = sigs[12][1] ^ (1 << 5)  # 1 bit off media 100
    batch = spark.createDataFrame(
        [(900, hot), (901, int(np.int64(np.uint64(near & 0xFFFFFFFFFFFFFFFF))))],
        ["media_id", "phash"],
    )
    uncapped = {
        (r["new_id"], r["index_id"])
        for r in probe_phash_index(spark, batch, idx, max_hamming=3).collect()
    }
    assert sum(1 for p in uncapped if p[0] == 900) == 12
    assert (901, 100) in uncapped
    capped = {
        (r["new_id"], r["index_id"])
        for r in probe_phash_index(
            spark, batch, idx, max_hamming=3, max_band_entries=6
        ).collect()
    }
    assert not any(p[0] == 900 for p in capped)
    assert (901, 100) in capped


def test_phash_incremental_band_stats_equal_full_recompute(spark, tmp_path):
    """r14 (VERDICT r13 task 4), pHash side: `mode="append"` folds the
    delta's (band, chunk) counts into the _band_counts sidecar by
    addition — no index rescan, no media_id dropDuplicates shuffle.
    Exactness gate vs a from-scratch recompute after two id-disjoint
    appends (one stacking more copies of a hot template hash); an
    n_bands-mismatched sidecar falls back to the full path."""
    from cds_etl_spark.operators.multimodal import (
        build_phash_index,
        write_phash_band_stats,
    )

    rng = np.random.default_rng(11)
    tpl_hash = int(rng.integers(-(2**63), 2**63 - 1))

    def sigs(ids, tpl_every=4):
        return spark.createDataFrame(
            [
                (i, tpl_hash)
                if i % tpl_every == 0
                else (i, int(rng.integers(-(2**63), 2**63 - 1)))
                for i in ids
            ],
            ["media_id", "phash"],
        )

    idx = str(tmp_path / "phinc")
    build_phash_index(sigs(range(16)), idx)
    build_phash_index(sigs(range(100, 110)), idx, mode="append")
    build_phash_index(sigs(range(200, 224)), idx, mode="append")

    def rows(p):
        return sorted(tuple(r) for r in spark.read.parquet(p).collect())

    inc_stats = rows(f"{idx}/_band_stats")
    inc_counts = rows(f"{idx}/_band_counts")
    write_phash_band_stats(spark, idx)  # full recompute, same index
    assert inc_stats == rows(f"{idx}/_band_stats")
    assert inc_counts == rows(f"{idx}/_band_counts")

    # Sidecar describing a DIFFERENT banding: the incremental merge
    # must refuse (returns False) and the build fall back to a full
    # recompute at the requested banding.
    idx2 = str(tmp_path / "phinc2")
    build_phash_index(sigs(range(16)), idx2, stats_n_bands=4)
    build_phash_index(
        sigs(range(100, 110)), idx2, mode="append", stats_n_bands=6
    )
    stats2 = spark.read.parquet(f"{idx2}/_band_stats")
    assert stats2.select("n_bands").distinct().collect()[0][0] == 6
    got = rows(f"{idx2}/_band_stats")
    write_phash_band_stats(spark, idx2, n_bands=6)
    assert got == rows(f"{idx2}/_band_stats")


def test_phash_band_stats_self_arming(spark, tmp_path):
    """r13 self-arming guard, pHash side: build writes a _band_stats
    histogram (hidden from the index table's own parquet discovery);
    the default "auto" probe is uncapped and warning-free on a healthy
    index, auto-caps with a RuntimeWarning (== explicit cap) when a
    (band, chunk) key exceeds the bound, and degrades to legacy
    uncapped output with a warning when stats are absent or describe a
    different banding."""
    import warnings

    import pytest

    from cds_etl_spark.operators.multimodal import (
        build_phash_index,
        probe_phash_index,
    )

    rng = np.random.default_rng(7)
    tpl_hash = int(rng.integers(-(2**63), 2**63 - 1))
    rows = [(i, tpl_hash) for i in range(10)] + [
        (100 + i, int(rng.integers(-(2**63), 2**63 - 1))) for i in range(8)
    ]
    sigs = spark.createDataFrame(rows, ["media_id", "phash"])
    idx = str(tmp_path / "armphash")
    build_phash_index(sigs, idx)

    # Stats are invisible to the index table read (underscore dir).
    assert spark.read.parquet(idx).count() == 18
    stats = spark.read.parquet(f"{idx}/_band_stats")
    assert stats.groupBy().max("max_occ").collect()[0][0] == 10
    assert stats.select("n_bands").distinct().collect()[0][0] == 4

    batch = spark.createDataFrame(
        [(900, tpl_hash), (901, tpl_hash ^ 1)], ["media_id", "phash"]
    )

    def pairs(**kw):
        return {
            (r["new_id"], r["index_id"])
            for r in probe_phash_index(
                spark, batch, idx, max_hamming=3, **kw
            ).collect()
        }

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        auto_healthy = pairs()
    assert auto_healthy == pairs(max_band_entries=None)
    assert sum(1 for p in auto_healthy if p[0] == 900) == 10

    with pytest.warns(RuntimeWarning, match="auto-capping at 5"):
        auto_hot = pairs(band_occupancy_bound=5)
    assert auto_hot == pairs(max_band_entries=5)
    assert not any(p[0] == 900 for p in auto_hot)

    # Banding mismatch: stats describe n_bands=4, probe uses 8.
    with pytest.warns(RuntimeWarning, match="stats unusable"):
        mism = {
            (r["new_id"], r["index_id"])
            for r in probe_phash_index(
                spark, batch, idx, max_hamming=7, band_occupancy_bound=5
            ).collect()
        }
    assert sum(1 for p in mism if p[0] == 900) == 10  # legacy uncapped

    # Stats-less legacy index.
    legacy = str(tmp_path / "legacyphash")
    build_phash_index(sigs, legacy, band_stats=False)
    import os

    assert not os.path.exists(f"{legacy}/_band_stats")
    with pytest.warns(RuntimeWarning, match="no _band_stats"):
        got = {
            (r["new_id"], r["index_id"])
            for r in probe_phash_index(
                spark, batch, legacy, band_occupancy_bound=5
            ).collect()
        }
    assert got == auto_healthy
