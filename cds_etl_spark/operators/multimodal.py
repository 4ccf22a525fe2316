"""Multimodal (image/audio/video) columns over Spark.

Media is carried as an opaque ``binary`` column plus a typed metadata
struct — the pattern that scales to 100 TB: Spark never interprets the
bytes; Parquet stores them page-compressed; all decode/compute happens
in Arrow-batched Python (``mapInPandas``), executor-side, with batch
size bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
partition of large blobs never materializes as one giant pandas frame.

The reference has no media handling at all (its closest surface is
opaque file rows with ``file_size``/``md5sum`` metadata,
3-Model-Files/cds-model.yml:144-162); this module is part of the
declared LLM-pipeline extension surface.

Codec stubs: real image/audio libs are not in this container, so the
byte-level decoders below are deterministic fakes behind
``try: import PIL`` gates, clearly marked. The Spark-side contract —
schemas, UDF signatures, Arrow batch iteration, explode shapes,
partition behavior — is real and is what the tests pin down.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder path — not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

# Typed metadata carried alongside the opaque bytes. A media table is
# (media_id long, kind string, content binary, meta MEDIA_META).
MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)


def synthetic_media(spark, n: int = 64, partitions: int = 8) -> DataFrame:
    """Deterministic fake media table (seeded by media_id) for tests and
    demos: bytes are a repeatable function of the id, metadata is
    consistent with the bytes. Generated distributed (spark.range), not
    driver-side."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for mid in pdf["id"]:
                rng = np.random.default_rng(int(mid))
                kind = kinds[int(mid) % 3]
                w, h = int(rng.integers(8, 64)), int(rng.integers(8, 64))
                nf = int(rng.integers(4, 32)) if kind == "video" else 1
                sr = 16000 if kind == "audio" else 0
                size = w * h if kind != "audio" else 1024
                content = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "content": content,
                        "meta": {
                            "format": "fake",
                            "width": w,
                            "height": h,
                            "sample_rate": sr,
                            "n_frames": nf,
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n, 1, partitions)
        .mapInPandas(_gen, schema=MEDIA_SCHEMA)
    )


def _decode_bytes(content: bytes, fmt: str) -> np.ndarray:
    """Decode media bytes to a pixel/sample array.

    STUB: with no codec libraries in this container, 'fake'-format
    bytes are interpreted as raw uint8; any real format raises to make
    the missing dependency explicit rather than silently wrong."""
    if fmt == "fake":
        return np.frombuffer(content, dtype=np.uint8)
    if _HAVE_PIL:
        raise NotImplementedError("real decoder wiring reserved for PIL builds")
    raise NotImplementedError(
        f"no codec for format={fmt!r}: image/audio libraries are not installed"
    )


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("mean_intensity", FloatType()),
        StructField("std_intensity", FloatType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Per-media feature extraction: decode → intensity stats → a
    deterministic ``dim``-float signature (histogram of the decoded
    array, L2-normalized — a stand-in with the exact shape of a real
    model embedding).

    ``mapInPandas``: one Arrow batch in, one out — no shuffle, scales
    with input partitioning. The projection (media_id, kind, content,
    meta.format) is column-pruned at the scan."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                arr = _decode_bytes(row["content"], row["fmt"])
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                norm = float(np.sqrt((hist.astype("float64") ** 2).sum())) or 1.0
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "n_bytes": len(row["content"]),
                        "mean_intensity": float(arr.mean()) if arr.size else 0.0,
                        "std_intensity": float(arr.std()) if arr.size else 0.0,
                        "embedding": (hist / norm).astype("float32").tolist(),
                    }
                )
            yield pd.DataFrame(out)

    pruned = df.select(
        "media_id", "kind", "content", F.col("meta.format").alias("fmt")
    )
    return pruned.mapInPandas(_feat, schema=FEATURES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize the image rows to (width, height) via nearest-neighbor
    index sampling on the decoded array (STUB decoder; a PIL build
    swaps ``_decode_bytes``/encode only — the Spark plumbing is
    identical). Non-image rows pass through unchanged."""
    schema = df.schema

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in pdf.index:
                meta = pdf.at[i, "meta"]
                if pdf.at[i, "kind"] != "image" or meta is None:
                    continue
                meta = dict(meta)
                arr = _decode_bytes(pdf.at[i, "content"], meta["format"])
                img = arr.reshape(meta["height"], meta["width"])
                ry = (np.arange(height) * meta["height"] // height).clip(0, meta["height"] - 1)
                rx = (np.arange(width) * meta["width"] // width).clip(0, meta["width"] - 1)
                pdf.at[i, "content"] = img[np.ix_(ry, rx)].astype(np.uint8).tobytes()
                meta["width"], meta["height"] = width, height
                pdf.at[i, "meta"] = meta
            yield pdf

    return df.mapInPandas(_resize, schema=schema)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_k: int = 4) -> DataFrame:
    """Sample every k-th frame of video rows → one output row per kept
    frame (a 1→N ``mapInPandas`` explode; output row count is
    data-dependent, which ``mapInPandas`` supports and ``pandas_udf``
    does not). Frame partitioning inherits from the input — at scale,
    repartition upstream by media_id if frames feed a per-video
    aggregation, so that stage shuffles frame *references* not blobs."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                if row["kind"] != "video":
                    continue
                meta = row["meta"]
                nf = int(meta["n_frames"]) or 1
                arr = _decode_bytes(row["content"], meta["format"])
                frame_len = max(len(arr) // nf, 1)
                for fi in range(0, nf, every_k):
                    chunk = arr[fi * frame_len : (fi + 1) * frame_len]
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": fi,
                            "frame": chunk.tobytes(),
                        }
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame"])

    return df.mapInPandas(_frames, schema=FRAME_SCHEMA)
