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

Codecs: formats whose containers need only numpy + the stdlib are
decoded/encoded FOR REAL — binary PPM/PGM images
(``decode_ppm``/``encode_ppm``), PCM16 WAV audio
(``decode_wav``/``encode_wav``), PNG (``decode_png``/
``encode_png`` — zlib inflate + the five scanline filters, color
types 0/2/4/6 at bit depth 8, non-interlaced), and baseline JPEG
(``operators/jpeg.py`` — full T.81 baseline sequential: quality-scaled
Annex K quantization, canonical Huffman, 4:4:4 and 4:2:0 sampling,
restart-marker-aware decode); the synthetic media table emits genuine
container bytes for all four. The one remaining gate is mp4/H.264
(container + CABAC entropy decode — far beyond pure-numpy scope), so
video payloads stay a clearly-marked raw-frame fake behind the PIL
import gate. The Spark-side contract — schemas, UDF signatures, Arrow
batch iteration, explode shapes, partition behavior — is identical
across real and stubbed codecs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cds_etl_spark.operators.pin import cut_lineage
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


# ---------------------------------------------------------------------------
# Real pure-numpy codecs: binary PPM/PGM (netpbm P6/P5) and PCM16 WAV.
# ---------------------------------------------------------------------------


def _pnm_tokens(buf: bytes, count: int) -> tuple[list[int], int]:
    """Read `count` whitespace-separated integer header tokens,
    skipping ``#`` comments; returns (tokens, offset past the single
    whitespace byte that terminates the header)."""
    toks: list[int] = []
    i, n = 0, len(buf)
    while len(toks) < count:
        while i < n and buf[i : i + 1].isspace():
            i += 1
        if i < n and buf[i] == ord("#"):
            while i < n and buf[i] != ord("\n"):
                i += 1
            continue
        j = i
        while j < n and not buf[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated netpbm header")
        toks.append(int(buf[i:j]))
        i = j
    return toks, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary netpbm decode: P6 → (h, w, 3) uint8, P5 → (h, w) uint8."""
    magic = content[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM: magic={magic!r}")
    (w, h, maxval), off = _pnm_tokens(content[2:], 3)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if magic == b"P6" else 1
    pixels = np.frombuffer(content, dtype=np.uint8, count=w * h * channels, offset=2 + off)
    return pixels.reshape((h, w, 3) if channels == 3 else (h, w)).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    """Inverse of :func:`decode_ppm`: (h, w, 3) → P6, (h, w) → P5."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6"
    elif arr.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (h,w,3) or (h,w), got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    return magic + f"\n{w} {h}\n255\n".encode() + arr.tobytes()


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """PCM16 RIFF/WAVE decode → ((n_samples, channels) int16, rate).
    Walks the chunk list, so extra chunks (LIST/INFO...) are fine."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(content):
        cid, size = content[pos : pos + 4], struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise ValueError(f"only PCM16 supported (tag={fmt_tag}, bits={bits})")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return samples.reshape(-1, channels).copy(), int(rate)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Inverse of :func:`decode_wav`: int16 (n,) or (n, ch) → PCM16 WAV."""
    import struct

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    channels = arr.shape[1]
    data = arr.tobytes()
    byte_rate = rate * channels * 2
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, channels * 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    return hdr + data


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(content: bytes) -> np.ndarray:
    """Pure numpy+zlib PNG decode: 8-bit gray/RGB/gray-alpha/RGBA,
    non-interlaced. Returns (h, w) for grayscale, (h, w, ch) otherwise.

    PNG is a zlib-deflate stream of filtered scanlines inside a CRC'd
    chunk list — no external codec needed: walk chunks, concatenate
    IDAT, inflate, then undo the per-row filter (None/Sub/Up/Average/
    Paeth). Up is fully vectorized; Sub is a per-channel running sum
    mod 256; Average/Paeth recurse on the previous pixel so they run
    per-pixel along the row (rows are short; the heavy lifting —
    inflate — is C either way)."""
    import struct
    import zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        ctype = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or color not in _PNG_CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color={color}, "
            f"interlace={interlace}); only 8-bit non-interlaced 0/2/4/6"
        )
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, rows = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, row = int(filters[y]), rows[y]
        if f == 0:
            rec = row
        elif f == 1:  # Sub: running sum per channel position
            rec = row.reshape(w, ch).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f == 3:  # Average: the left-dependency is per PIXEL, so
            # iterate pixel columns and vectorize across the channel
            # bytes (ch-wide numpy ops; w iterations, not w*ch).
            r2, p2 = row.reshape(w, ch), prev.reshape(w, ch)
            rec2 = np.empty((w, ch), dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                left = (r2[x] + ((left + p2[x]) >> 1)) % 256
                rec2[x] = left
            rec = rec2.reshape(stride)
        elif f == 4:  # Paeth: same per-pixel recurrence, channel-vectorized
            r2, p2 = row.reshape(w, ch), prev.reshape(w, ch)
            rec2 = np.empty((w, ch), dtype=np.int32)
            a = np.zeros(ch, dtype=np.int32)  # reconstructed left
            c = np.zeros(ch, dtype=np.int32)  # reconstructed upper-left
            for x in range(w):
                b = p2[x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                a = (r2[x] + pred) % 256
                rec2[x] = a
                c = b
            rec = rec2.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = out[y]
    pixels = out.astype(np.uint8)
    return pixels.reshape(h, w) if ch == 1 else pixels.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """Inverse of :func:`decode_png`: (h, w) → gray, (h, w, 2) →
    gray+alpha, (h, w, 3) → RGB, (h, w, 4) → RGBA; 8-bit,
    non-interlaced, filter 0 scanlines (decoders must accept any
    filter, encoders may pick the simplest)."""
    import struct
    import zlib

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        color, ch = 0, 1
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        color = {2: 4, 3: 2, 4: 6}[arr.shape[2]]
        ch = arr.shape[2]
    else:
        raise ValueError(f"expected (h,w[,2|3|4]) uint8, got {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    body = arr.reshape(h, w * ch)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def synthetic_media(spark, n: int = 64, partitions: int = 8) -> DataFrame:
    """Deterministic media table (seeded by media_id) for tests and
    demos: images are REAL binary PPMs, audio REAL PCM16 WAVs (both
    decodable by anything, not just this module); video payloads are
    raw concatenated fake frames (no pure-numpy container exists).
    Generated distributed (spark.range), not driver-side."""

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
                if kind == "image":
                    # Rotate the real container formats so every image
                    # consumer exercises all three codec paths (jpeg is
                    # lossy — consumers must treat pixels as decoded
                    # content, not expect the raw rng values back).
                    fmt = ("ppm", "png", "jpeg")[(int(mid) // 3) % 3]
                    pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                    if fmt == "ppm":
                        content = encode_ppm(pixels)
                    elif fmt == "png":
                        content = encode_png(pixels)
                    else:
                        from cds_etl_spark.operators.jpeg import encode_jpeg

                        content = encode_jpeg(pixels, quality=90)
                elif kind == "audio":
                    fmt = "wav"
                    samples = rng.integers(-32768, 32768, size=1024).astype("<i2")
                    content = encode_wav(samples, sr)
                elif (int(mid) // 3) % 2 == 0:
                    fmt = "fake"
                    content = rng.integers(
                        0, 256, size=w * h, dtype=np.uint8
                    ).tobytes()
                else:
                    # Real ISO-BMFF container around raw frame
                    # payloads: the sample table is genuine (any box
                    # walker parses it); the payload codec is declared
                    # 'raw ' — container real, codec honest.
                    from cds_etl_spark.operators.mp4 import encode_mp4

                    fmt = "mp4"
                    content = encode_mp4(
                        [
                            rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
                            for _ in range(nf)
                        ],
                        w,
                        h,
                    )
                rows.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "content": content,
                        "meta": {
                            "format": fmt,
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


def _decode_video_av(
    content: bytes, every_k: int = 1
) -> "list[np.ndarray] | None":
    """Decode a real-codec (H.264/H.265/…) video via PyAV when it is
    importable, else return None (callers fall back to their gate).
    Returns every ``every_k``-th frame as an (H, W, 3) uint8 RGB
    array. Import-gated on purpose: the sandbox ships no codec
    libraries, so PyAV presence is an environment property — the
    Spark-side plumbing (schema, batching, sharding) is identical
    either way and is what the tests pin."""
    try:
        import av  # PyAV — optional, not in the default environment
    except ImportError:
        return None
    import io

    frames: list[np.ndarray] = []
    with av.open(io.BytesIO(content)) as container:
        stream = container.streams.video[0]
        for i, frame in enumerate(container.decode(stream)):
            if i % every_k == 0:
                frames.append(frame.to_ndarray(format="rgb24"))
    return frames


def _decode_bytes(content: bytes, fmt: str) -> np.ndarray:
    """Decode media bytes to a pixel/sample array.

    ``ppm``/``pgm``, ``png``, ``jpeg``, and ``wav`` decode for real
    (pure numpy+stdlib — jpeg via operators/jpeg.py baseline T.81).
    ``fake`` is raw uint8 (video frame payloads). Formats needing real
    codec libraries (mp4/h264), absent here, raise to make the missing
    dependency explicit rather than silently wrong."""
    if fmt in ("ppm", "pgm"):
        return decode_ppm(bytes(content))
    if fmt == "png":
        return decode_png(bytes(content))
    if fmt in ("jpeg", "jpg"):
        from cds_etl_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(bytes(content))
    if fmt == "wav":
        samples, _ = decode_wav(bytes(content))
        return samples
    if fmt == "fake":
        return np.frombuffer(content, dtype=np.uint8)
    if fmt in ("h264", "avc"):
        # Annex-B elementary stream: the in-engine layer decodes
        # I_PCM IDR frames bit-exactly; predicted macroblocks raise
        # the documented CAVLC/CABAC gate (operators/h264.py module
        # docstring records the decision + rationale).
        from cds_etl_spark.operators.h264 import decode_h264

        return decode_h264(bytes(content))
    if fmt == "mp4":
        # Container parses for real (operators/mp4.py); whether the
        # sample payloads decode depends on the declared codec.
        from cds_etl_spark.operators.mp4 import extract_samples, probe_mp4

        info = probe_mp4(bytes(content))
        if info["codec"] == "raw":
            return np.frombuffer(
                b"".join(extract_samples(bytes(content))), dtype=np.uint8
            )
        frames = _decode_video_av(bytes(content))
        if frames is not None:
            return np.stack(frames) if frames else np.zeros((0,), np.uint8)
        if info["codec"] in ("avc1", "h264"):
            # In-engine fallback: avcC out-of-band SPS/PPS + AVCC
            # samples → Annex-B → the I_PCM subset decoder
            # (operators/h264.py); real-codec frames raise its
            # documented CAVLC/CABAC gate.
            from cds_etl_spark.operators.h264 import (
                avcc_config_to_annexb,
                avcc_to_annexb,
                decode_h264,
            )
            from cds_etl_spark.operators.mp4 import extract_avcc

            record = extract_avcc(bytes(content))
            if not record:
                # No out-of-band parameter sets: payloads can't be
                # framed — this is the codec gate, not a parse bug
                # (r9 ADVICE: was a bare 'slice before SPS/PPS').
                raise NotImplementedError(
                    "avc1 track has no avcC parameter sets — needs an "
                    "external decoder (install PyAV, import name 'av')"
                )
            prefix, nls = avcc_config_to_annexb(record)
            samples = extract_samples(bytes(content))
            decoded = [
                decode_h264(prefix + avcc_to_annexb(s, nls))
                for s in samples
            ]
            # Zero-sample track: match the raw-codec branch's empty
            # array instead of np.stack's bare ValueError (r9 ADVICE).
            return (
                np.stack(decoded) if decoded else np.zeros((0,), np.uint8)
            )
        raise NotImplementedError(
            f"mp4 codec {info['codec']!r} needs an external decoder "
            "(container parsed fine; H.264/H.265 entropy decode is "
            "gated — install PyAV, import name 'av', to enable it)"
        )
    if _HAVE_PIL:
        raise NotImplementedError("real decoder wiring reserved for PIL builds")
    raise NotImplementedError(
        f"no codec for format={fmt!r}: video codec libraries are not installed"
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
                arr = _decode_bytes(row["content"], row["fmt"]).ravel()
                if arr.dtype == np.int16:
                    # Audio samples → the same 0..255 intensity scale
                    # as pixels, so one histogram signature covers all
                    # modalities.
                    arr = ((arr.astype(np.float64) + 32768.0) / 257.0)
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
    index sampling on the decoded pixel array — a real decode →
    transform → re-encode round trip for PPM/PGM bytes (legacy 'fake'
    grayscale payloads resize as raw rasters). Non-image rows pass
    through unchanged."""
    schema = df.schema

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in pdf.index:
                meta = pdf.at[i, "meta"]
                if pdf.at[i, "kind"] != "image" or meta is None:
                    continue
                meta = dict(meta)
                arr = _decode_bytes(pdf.at[i, "content"], meta["format"])
                if arr.ndim == 1:  # fake raw raster
                    arr = arr.reshape(meta["height"], meta["width"])
                h0, w0 = arr.shape[0], arr.shape[1]
                ry = (np.arange(height) * h0 // height).clip(0, h0 - 1)
                rx = (np.arange(width) * w0 // width).clip(0, w0 - 1)
                resized = arr[np.ix_(ry, rx)].astype(np.uint8)
                if meta["format"] in ("ppm", "pgm"):
                    pdf.at[i, "content"] = encode_ppm(resized)
                elif meta["format"] == "png":
                    pdf.at[i, "content"] = encode_png(resized)
                elif meta["format"] in ("jpeg", "jpg"):
                    from cds_etl_spark.operators.jpeg import encode_jpeg

                    pdf.at[i, "content"] = encode_jpeg(resized, quality=90)
                else:
                    pdf.at[i, "content"] = resized.tobytes()
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
                if meta["format"] == "mp4":
                    # Real container-level split: per-sample byte
                    # ranges from the stbl sample table — the shard
                    # step a video pipeline runs BEFORE any codec.
                    from cds_etl_spark.operators.mp4 import (
                        extract_samples,
                        probe_mp4,
                    )

                    content = bytes(row["content"])
                    if probe_mp4(content)["codec"] != "raw":
                        # Real codec: decode end-to-end when PyAV is
                        # importable (frame = RGB pixels); otherwise
                        # keep the encoded access units — the shard
                        # step still works, decode stays gated.
                        decoded = _decode_video_av(content, every_k)
                        if decoded is not None:
                            for j, arr in enumerate(decoded):
                                out.append(
                                    {
                                        "media_id": row["media_id"],
                                        "frame_idx": j * every_k,
                                        "frame": arr.tobytes(),
                                    }
                                )
                            continue
                    samples = extract_samples(content)
                    for fi in range(0, len(samples), every_k):
                        out.append(
                            {
                                "media_id": row["media_id"],
                                "frame_idx": fi,
                                "frame": samples[fi],
                            }
                        )
                    continue
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


# ---------------------------------------------------------------------------
# Perceptual image hashing (pHash) and audio signal features.
# ---------------------------------------------------------------------------


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (n×n), float64. Row 0 is the DC
    basis scaled by sqrt(1/n), rows 1.. by sqrt(2/n) — the standard
    type-II normalization, so ``D @ A @ D.T`` is the 2-D DCT of A."""
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] *= np.sqrt(0.5)
    return d


_DCT32 = _dct_matrix(32)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of an image array (H×W or H×W×C uint8).

    The classic pHash recipe: grayscale → 32×32 downsample
    (nearest-neighbor index sampling, same kernel as resize_images) →
    2-D DCT-II → keep the top-left 8×8 low-frequency block → each bit
    is coeff > median of the 63 AC coefficients (DC excluded: it is
    plain brightness, and including it would make the hash flip under
    uniform exposure changes). Near-duplicate images — recompression,
    mild noise, brightness shifts — land within a few bits' Hamming
    distance; unrelated images differ in ~32.

    Pure numpy and deterministic: the same pixels yield the same hash
    on every executor, so the hash is a join key, not a heuristic.
    Returned as a signed int64 (Spark BIGINT) with the bit pattern of
    the uint64 hash."""
    a = np.asarray(pixels, dtype=np.float64)
    if a.ndim == 3:
        a = a.mean(axis=2)
    h, w = a.shape
    ys = (np.arange(32) * h) // 32
    xs = (np.arange(32) * w) // 32
    small = a[np.ix_(ys, xs)]
    coeffs = (_DCT32 @ small @ _DCT32.T)[:8, :8].ravel()
    ac = coeffs[1:]
    # Degenerate (solid/blank) image: the AC spectrum is zero up to
    # float noise (~1e-11 for a constant plane). Without this gate the
    # noise-vs-noise median comparison sets an arbitrary half of the
    # bits — two blank frames would hash far apart AND unpredictably.
    # Force the canonical all-zero hash so blanks are detectable.
    if np.max(np.abs(ac)) < 1e-6:
        return 0
    bits = coeffs > np.median(ac)
    bits[0] = False  # DC slot always 0: brightness-invariant
    packed = np.uint64(0)
    for b in bits:
        packed = np.uint64(packed << np.uint64(1)) | np.uint64(bool(b))
    return int(packed.astype(np.int64))


PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
    ]
)


def phash_images(df: DataFrame) -> DataFrame:
    """Perceptual hash per image row: decode → ``phash64``. Arrow-
    batched ``mapInPandas`` over a (media_id, content, format)
    projection — column-pruned at the scan, no shuffle; at 100 TB of
    images the cost is the decode itself and the output is 16 bytes a
    row. Non-image rows are filtered out plan-side (decode never sees
    them)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                arr = _decode_bytes(row["content"], row["fmt"])
                out.append(
                    {"media_id": row["media_id"], "phash": phash64(arr)}
                )
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    pruned = df.filter(F.col("kind") == "image").select(
        "media_id", "content", F.col("meta.format").alias("fmt")
    )
    return pruned.mapInPandas(_hash, schema=PHASH_SCHEMA)


def _bands_for(max_hamming: int) -> int:
    """Smallest power-of-two divisor of 64 strictly greater than
    ``max_hamming``: the pigeonhole recall guarantee needs
    max_hamming < n_bands. Bands are capped at 16 (4-bit chunks —
    beyond distance 15 banding stops being selective and a coarser
    strategy is needed anyway), and rather than silently losing the
    recall guarantee past the cap, distances >= 16 are an error."""
    if max_hamming >= 16:
        raise ValueError(
            "max_hamming >= 16 breaks the pigeonhole recall guarantee"
            " (64-bit hashes band into at most 16 chunks); use a"
            " coarser signature or multi-probe strategy instead"
        )
    b = 1
    while b <= max_hamming:
        b *= 2
    return b


def _hash_chunks(hash_col: str, n_bands: int):
    """Array of (band, chunk) structs splitting a 64-bit hash column
    into ``n_bands`` contiguous chunks — the banding key shared by the
    in-memory near-dup join and the persisted-index probe (the chunks
    are DERIVED from the stored hash, so an index never materializes
    band rows)."""
    width = 64 // n_bands
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.expr(f"shiftright({hash_col}, {i * width}) & {mask}").alias(
                    "chunk"
                ),
            )
            for i in range(n_bands)
        ]
    )


def hamming_near_dup(
    sigs: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    n_bands: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs among 64-bit signatures by Hamming
    distance — the image twin of MinHash-LSH banding. The 64-bit hash
    splits into ``n_bands`` contiguous chunks; by pigeonhole, two
    hashes within ``max_hamming`` bits (max_hamming < n_bands) agree
    EXACTLY on at least one chunk, so the candidate set is a per-band
    equi-join on (band, chunk value) — never an all-pairs comparison.
    Candidates are then refined with an exact ``bit_count(a XOR b)``.

    Recall is GUARANTEED (pigeonhole, not probabilistic) when
    ``max_hamming < n_bands``; by default ``n_bands`` is chosen as the
    smallest power-of-two divisor of 64 exceeding ``max_hamming``, so
    the guarantee always holds (passing n_bands explicitly can trade
    recall for fewer/longer chunks). Precision comes from the exact
    refine.
    At corpus scale the shuffle carries (id, 16-byte hash) rows and
    the join keys are 16-bit chunks — skew-bounded because a chunk
    bucket holds only visually-similar low-frequency spectra.

    Returns (id_a, id_b, hamming) with id_a < id_b, one row per pair."""
    n_bands = n_bands or _bands_for(max_hamming)
    chunks = _hash_chunks(hash_col, n_bands)
    banded = sigs.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("h"),
        F.explode(chunks).alias("b"),
    ).select("id", "h", F.col("b.band").alias("band"), F.col("b.chunk").alias("chunk"))
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.h").alias("ha"),
            F.col("r.h").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", FloatType()),
        StructField("rms", FloatType()),
        StructField("zero_cross_rate", FloatType()),
        StructField("silence_frac", FloatType()),
    ]
)


def extract_audio_features(
    df: DataFrame, frame: int = 256, silence_threshold: float = 0.01
) -> DataFrame:
    """Per-clip audio quality signals — the filters an audio-corpus
    pipeline gates on before transcription: RMS level (too quiet →
    drop), zero-crossing rate (crude speech/noise discriminator), and
    silence fraction (frames whose RMS is below ``silence_threshold``
    of full scale — mostly-silent clips waste training tokens).

    Decodes real PCM16 WAV bytes executor-side (``decode_wav``), all
    numpy, Arrow-batched ``mapInPandas`` on a pruned projection; no
    shuffle, output is one narrow row per clip."""

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                samples, rate = decode_wav(bytes(row["content"]))
                # Mono-mix first (decode_wav returns (n_samples,
                # channels)): n must count FRAMES, not samples ×
                # channels, or stereo duration doubles and the framed
                # reshape below breaks on multi-channel clips.
                x = samples.astype(np.float64).mean(axis=1) / 32768.0
                n = x.size
                rms = float(np.sqrt(np.mean(x**2))) if n else 0.0
                zcr = (
                    float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                    if n > 1
                    else 0.0
                )
                nf = n // frame
                if nf:
                    frames = x[: nf * frame].reshape(nf, frame)
                    frms = np.sqrt((frames**2).mean(axis=1))
                    silence = float((frms < silence_threshold).mean())
                else:
                    silence = 1.0 if rms < silence_threshold else 0.0
                out.append(
                    {
                        "media_id": row["media_id"],
                        "n_samples": n,
                        "sample_rate": rate,
                        "duration_s": float(n / rate) if rate else 0.0,
                        "rms": rms,
                        "zero_cross_rate": zcr,
                        "silence_frac": silence,
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    pruned = df.filter(F.col("kind") == "audio").select("media_id", "content")
    return pruned.mapInPandas(_feats, schema=AUDIO_FEATURES_SCHEMA)


def _auto_phash_band_cap(
    spark, path: str, n_bands: int, bound: int
) -> int | None:
    """"auto" guard policy for the pHash probe: arm the cap only when
    the build-time stats exist, describe THIS banding, and show a
    (band, chunk) key above ``bound``; otherwise warn + legacy
    uncapped output (mirrors dedup._auto_band_cap, plus the banding
    match check the derived-key design makes necessary).

    Only the missing-path AnalysisException downgrades to the legacy
    warning (r14 ADVICE): IO/permission errors and corrupted stats
    re-raise instead of silently disabling the guard."""
    import warnings

    from pyspark.errors import AnalysisException

    from cds_etl_spark.operators.dedup import _is_missing_path

    try:
        row = (
            spark.read.parquet(f"{path}/_band_stats")
            .agg(
                F.max("max_occ").alias("m"),
                F.max("n_bands").alias("nb"),
            )
            .collect()[0]
        )
    except AnalysisException as exc:
        if not _is_missing_path(exc):
            raise
        warnings.warn(
            f"probe_phash_index: no _band_stats at {path} — index "
            f"predates the r13 self-arming guard; probing UNCAPPED "
            f"(legacy output). Rebuild/compact with build_phash_index "
            f"or pass max_band_entries explicitly. "
            f"[{str(exc).splitlines()[0]}]",
            RuntimeWarning,
            stacklevel=3,
        )
        return None
    if row["nb"] != n_bands:
        warnings.warn(
            f"probe_phash_index: _band_stats describe n_bands="
            f"{row['nb']} but this probe bands into {n_bands} — "
            f"stats unusable, probing UNCAPPED (legacy output). "
            f"Refresh with write_phash_band_stats(..., n_bands="
            f"{n_bands}) or pass max_band_entries explicitly.",
            RuntimeWarning,
            stacklevel=3,
        )
        return None
    if row["m"] is not None and row["m"] > bound:
        warnings.warn(
            f"probe_phash_index: hottest (band, chunk) holds "
            f"{row['m']} index entries (> bound {bound}) — probe "
            f"output is quadratic in template duplication; "
            f"auto-capping at {bound}. Mega-cluster exact duplicates "
            f"belong to exact-hash dedup; see the collateral-recall "
            f"caveat in the probe docstring.",
            RuntimeWarning,
            stacklevel=3,
        )
        return bound
    return None


def _phash_band_counts(sigs: DataFrame, n_bands: int) -> DataFrame:
    """Exact per-(band, chunk) occupancy of a signature set — the
    mergeable intermediate both stats paths share (histogram buckets
    and per-bucket maxes are NOT mergeable across batches; per-key
    counts are, by plain addition)."""
    return (
        sigs.dropDuplicates(["media_id"])
        .select(F.explode(_hash_chunks("phash", n_bands)).alias("b"))
        .groupBy(F.col("b.band").alias("band"), F.col("b.chunk").alias("chunk"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _write_phash_stats(counts: DataFrame, path: str, n_bands: int) -> None:
    """Materialize merged counts, then overwrite both sidecars:
    ``_band_counts`` (per-key, the incremental-merge substrate) and
    ``_band_stats`` (the ~n_bands·20-row histogram the probe guard
    reads in one footer hit). localCheckpoint breaks lineage BEFORE
    the overwrite so a refresh may read the old counts as its own
    input without self-truncation."""
    counts = cut_lineage(counts)  # pin: corpus-scale (row per band key)
    (
        counts.withColumn("n_bands", F.lit(n_bands))
        .write.mode("overwrite")
        .parquet(f"{path}/_band_counts")
    )
    (
        counts.groupBy(
            "band", F.ceil(F.log2("n")).cast("int").alias("occ_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").alias("max_occ"),
        )
        .withColumn("n_bands", F.lit(n_bands))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/_band_stats")
    )


def write_phash_band_stats(
    spark, path: str, n_bands: int | None = None
) -> None:
    """(Re)compute the (band, chunk)-occupancy histogram for a
    persisted pHash index and overwrite ``{path}/_band_stats`` (the
    underscore prefix hides it from the index table's own parquet
    discovery, like ``_SUCCESS``): one row per (n_bands, band,
    ⌈log2 occupancy⌉ bucket) with key count and exact max occupancy.
    Banding keys are derived from the stored hashes, so stats are
    computed for a CONCRETE ``n_bands`` (default: the banding for the
    probe's default max_hamming=3) and record it — a probe with a
    different banding treats them as absent. Cost: one aggregate scan
    of the 16-byte-row index, the same class as any probe. Also
    persists the per-key ``_band_counts`` sidecar that lets
    ``append_phash_band_stats`` maintain these stats incrementally
    (r14): subsequent appends merge the delta's counts instead of
    rescanning the index."""
    n_bands = n_bands or _bands_for(3)
    counts = _phash_band_counts(spark.read.parquet(path), n_bands)
    _write_phash_stats(counts, path, n_bands)


def append_phash_band_stats(
    spark, path: str, delta_sigs: DataFrame, n_bands: int | None = None
) -> bool:
    """Incrementally fold an appended batch into the persisted stats
    (r14, VERDICT r13 task 4): per-key occupancies are mergeable by
    addition, so the update is delta-aggregate (batch-scale) ∪ old
    ``_band_counts`` (already one narrow row per key) → one sum — no
    index rescan, no media_id dropDuplicates shuffle, no explode of
    the standing index. Returns True when the incremental merge ran;
    False when no compatible ``_band_counts`` exists (legacy index or
    n_bands mismatch — caller should full-refresh instead).

    EXACTNESS CONTRACT: equal to a full recompute iff the delta's
    media_ids are disjoint from the index (what the ingest loop's
    probe + anti-join guarantees). A crash-replayed or overlapping
    append double-counts those ids — which can only OVER-arm the
    hot-band guard (safe direction); a compaction or
    ``write_phash_band_stats`` refresh restores exactness."""
    from pyspark.errors import AnalysisException

    from cds_etl_spark.operators.dedup import _is_missing_path

    n_bands = n_bands or _bands_for(3)
    try:
        old = spark.read.parquet(f"{path}/_band_counts")
        old_nb = old.select(F.max("n_bands")).collect()[0][0]
    except AnalysisException as exc:
        if not _is_missing_path(exc):
            raise
        return False
    if old_nb != n_bands:
        return False
    delta = _phash_band_counts(delta_sigs, n_bands)
    merged = (
        old.select("band", "chunk", "n")
        .unionByName(delta)
        .groupBy("band", "chunk")
        .agg(F.sum("n").alias("n"))
    )
    _write_phash_stats(merged, path, n_bands)
    return True


def build_phash_index(
    sigs: DataFrame,
    path: str,
    mode: str = "overwrite",
    band_stats: bool = True,
    stats_n_bands: int | None = None,
) -> None:
    """Persist a pHash dedup index: ONE parquet table of
    (media_id, phash) — 16 bytes a row. Unlike the MinHash index
    (which must store band rows because recomputing them needs the
    original text), the Hamming banding keys are derived from the
    stored hash itself at probe time with integer shifts, so the index
    stores nothing but the signature: the decode — the only expensive
    step — is paid once at ingest, and the standing index for a
    billion images is ~16 GB of parquet. ``mode="append"`` is the
    continuous-ingest path.

    ``band_stats=True`` (default) refreshes the tiny ``_band_stats``
    occupancy histogram from the FULL on-disk index after the write,
    arming ``probe_phash_index``'s default "auto" hot-band guard
    (same r13 self-arming contract as ``build_minhash_index``);
    ``stats_n_bands`` pins the banding the stats describe (default:
    the max_hamming=3 banding). ``band_stats=False`` skips the extra
    scan — refresh on the compaction cadence instead.

    r14: on ``mode="append"`` against an index whose counts sidecar
    exists, the stats refresh is INCREMENTAL (delta-counts merge,
    ``append_phash_band_stats``) instead of a full index rescan —
    exact for id-disjoint appends, the ingest-loop invariant."""
    spark = sigs.sparkSession
    if mode == "append" and band_stats:
        # The delta must be materialized pre-write: after the append
        # lands, re-reading ``sigs`` lazily from source is fine, but
        # a plan reading from ``path`` itself would double-count.
        sigs = cut_lineage(  # pin: corpus-scale delta
            sigs.select("media_id", "phash")
        )
        sigs.write.mode("append").parquet(path)
        if not append_phash_band_stats(spark, path, sigs, stats_n_bands):
            write_phash_band_stats(spark, path, stats_n_bands)
        return
    sigs.select("media_id", "phash").write.mode(mode).parquet(path)
    if band_stats:
        write_phash_band_stats(spark, path, stats_n_bands)


def probe_phash_index(
    spark,
    new_sigs: DataFrame,
    path: str,
    max_hamming: int = 3,
    n_bands: int | None = None,
    broadcast_batch: bool = True,
    max_band_entries: int | str | None = "auto",
    band_occupancy_bound: int | None = None,
) -> DataFrame:
    """Probe a batch of signatures against a persisted pHash index:
    returns (new_id, index_id, hamming) pairs within ``max_hamming``
    bits. Recall is pigeonhole-guaranteed for max_hamming < n_bands.

    ``max_band_entries``: hot-band guard (r12 index skew audit, same
    hazard as the MinHash probe): k copies of one template image
    share every (band, chunk) key, so probe output is quadratic in
    the duplication rate. With a cap, index-side band keys above it
    are excluded — mega-cluster exact duplicates belong to exact-hash
    dedup, not the Hamming probe. ``"auto"`` (default, r13
    self-arming): read the build-time ``_band_stats`` histogram; if
    its banding matches this probe's ``n_bands`` and some key exceeds
    ``band_occupancy_bound`` (default
    ``dedup.DEFAULT_BAND_OCCUPANCY_BOUND``), warn and cap at the
    bound; stats absent or banding-mismatched warns and runs uncapped
    (legacy output). ``None`` = never cap; an int = explicit cap.

    CAVEAT (collateral recall, r12 ADVICE): the guard drops ALL
    candidates in a hot (band, chunk), not just template pairs — a
    genuine near-duplicate whose ONLY matching chunk is hot loses
    that candidate AND, unlike MinHash banding, the pigeonhole
    guarantee (≤ max_hamming errors spread over n_bands chunks) no
    longer covers it. When hot chunks can be populated by
    NON-identical content (e.g. images sharing a letterbox border
    that dominates one chunk), raise n_bands via a larger
    max_hamming or raise the cap.

    Scale shape: the index scan reads 16-byte rows and explodes each
    into ``n_bands`` integer chunk keys in the scan stage; the (small)
    arriving batch broadcasts, so the probe is a map-side join over
    the index — no index shuffle, no state on any heap. The
    dropDuplicates on the index side is the replay guard: a streaming
    ingest that crash-replays an epoch appends identical rows, which
    must not duplicate probe pairs."""
    from cds_etl_spark.operators.dedup import DEFAULT_BAND_OCCUPANCY_BOUND

    n_bands = n_bands or _bands_for(max_hamming)
    if band_occupancy_bound is None:
        band_occupancy_bound = DEFAULT_BAND_OCCUPANCY_BOUND
    if isinstance(max_band_entries, str) and max_band_entries != "auto":
        # A typo'd string would otherwise flow into the `_n > <str>`
        # filter where Spark's numeric cast yields null → empty hot
        # set → silently uncapped probe (r14 ADVICE).
        raise ValueError(
            f"max_band_entries must be an int, None, or the exact "
            f"string 'auto'; got {max_band_entries!r}"
        )
    if max_band_entries == "auto":
        max_band_entries = _auto_phash_band_cap(
            spark, path, n_bands, band_occupancy_bound
        )
    idx = (
        spark.read.parquet(path)
        .dropDuplicates(["media_id"])
        .select(
            F.col("media_id").alias("_iid"), F.col("phash").alias("_ih")
        )
    )
    banded_idx = idx.select(
        "_iid", "_ih", F.explode(_hash_chunks("_ih", n_bands)).alias("b")
    ).select("_iid", "_ih", "b.band", "b.chunk")
    if max_band_entries is not None:
        # Unhinted anti-join (r12 broadcast-audit rule): the hot-band
        # list is corpus-proportional in the worst case.
        hot = (
            banded_idx.groupBy("band", "chunk")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_band_entries)
            .select("band", "chunk")
        )
        banded_idx = banded_idx.join(hot, ["band", "chunk"], "left_anti")
    new = new_sigs.select(
        F.col("media_id").alias("_nid"), F.col("phash").alias("_nh")
    )
    banded_new = new.select(
        "_nid", "_nh", F.explode(_hash_chunks("_nh", n_bands)).alias("b")
    ).select("_nid", "_nh", "b.band", "b.chunk")
    if broadcast_batch:
        banded_new = F.broadcast(banded_new)
    cand = (
        banded_idx.join(banded_new, ["band", "chunk"])
        .select("_nid", "_iid", "_nh", "_ih")
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.expr("bit_count(_nh ^ _ih)"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("_nid").alias("new_id"),
            F.col("_iid").alias("index_id"),
            "hamming",
        )
    )


IMAGE_QUALITY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("brightness", FloatType()),
        StructField("contrast", FloatType()),
        StructField("sharpness", FloatType()),
        StructField("gray_entropy", FloatType()),
    ]
)


def image_quality_features(df: DataFrame) -> DataFrame:
    """Per-image quality gates — the filters an image-corpus pipeline
    drops on before captioning/training (the LAION-style pass):

    * ``brightness`` — mean gray level (reject near-black/blown-out);
    * ``contrast`` — gray std (reject flat images);
    * ``sharpness`` — variance of the 4-neighbour Laplacian, THE
      standard blur detector (a gaussian-blurred copy of an image
      scores an order of magnitude lower);
    * ``gray_entropy`` — Shannon entropy of the 256-bin gray histogram
      in bits (synthetic/flat graphics score low, photos high).

    Pure-numpy decode + vectorized filters, Arrow-batched
    ``mapInPandas`` on a pruned (media_id, content, format)
    projection — no shuffle; at corpus scale the cost is the decode."""

    def _q(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in IMAGE_QUALITY_SCHEMA.fields]
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                arr = _decode_bytes(row["content"], row["fmt"])
                g = arr.astype(np.float64)
                if g.ndim == 3:
                    g = g.mean(axis=2)
                h, w = g.shape
                lap = (
                    4 * g[1:-1, 1:-1]
                    - g[:-2, 1:-1]
                    - g[2:, 1:-1]
                    - g[1:-1, :-2]
                    - g[1:-1, 2:]
                ) if min(h, w) >= 3 else np.zeros((1, 1))
                hist, _ = np.histogram(g, bins=256, range=(0, 256))
                p = hist[hist > 0] / g.size
                out.append(
                    {
                        "media_id": row["media_id"],
                        "width": w,
                        "height": h,
                        "brightness": float(g.mean()),
                        "contrast": float(g.std()),
                        "sharpness": float(lap.var()),
                        "gray_entropy": float(-(p * np.log2(p)).sum()),
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    pruned = df.filter(F.col("kind") == "image").select(
        "media_id", "content", F.col("meta.format").alias("fmt")
    )
    return pruned.mapInPandas(_q, schema=IMAGE_QUALITY_SCHEMA)


SPECTRAL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("spectral_centroid_hz", FloatType()),
        StructField("dominant_freq_hz", FloatType()),
        StructField("high_freq_ratio", FloatType()),
    ]
)


def extract_spectral_features(
    df: DataFrame, high_cut_hz: float = 4000.0
) -> DataFrame:
    """Spectral audio signals via numpy rFFT — the frequency-domain
    complements to ``extract_audio_features``' time-domain gates:
    spectral centroid (speech sits ~300–3000 Hz; hiss and tones
    elsewhere), dominant frequency (single-tone detector — test
    signals, dial tones, alarm loops), and the energy fraction above
    ``high_cut_hz`` (codec artifacts/noise). Mono-mixed before the
    FFT; Arrow-batched, no shuffle."""

    def _s(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SPECTRAL_SCHEMA.fields]
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                samples, rate = decode_wav(bytes(row["content"]))
                x = samples.astype(np.float64).mean(axis=1)
                n = x.size
                if n < 2 or rate <= 0:
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "spectral_centroid_hz": 0.0,
                            "dominant_freq_hz": 0.0,
                            "high_freq_ratio": 0.0,
                        }
                    )
                    continue
                mag = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                power = mag**2
                tot = power.sum() or 1.0
                out.append(
                    {
                        "media_id": row["media_id"],
                        "spectral_centroid_hz": float(
                            (freqs * power).sum() / tot
                        ),
                        "dominant_freq_hz": float(freqs[int(power.argmax())]),
                        "high_freq_ratio": float(
                            power[freqs > high_cut_hz].sum() / tot
                        ),
                    }
                )
            yield pd.DataFrame(out, columns=cols)

    pruned = df.filter(F.col("kind") == "audio").select("media_id", "content")
    return pruned.mapInPandas(_s, schema=SPECTRAL_SCHEMA)


def compact_phash_index(spark, path: str, out_path: str) -> None:
    """Maintenance pass for an append-only pHash index: rewrite
    deduplicated (one row per media_id) to ``out_path`` — probe
    results unchanged (probe already dedups through its replay
    guard), future probes stop re-paying the guard and the
    small-file listing tax. New-directory write; the caller owns the
    atomic swap (the sources/compact.py contract)."""
    (
        spark.read.parquet(path)
        .dropDuplicates(["media_id"])
        .write.mode("overwrite")
        .parquet(out_path)
    )
    # Compaction is the stats-refresh point for ingest loops that
    # append with band_stats=False.
    write_phash_band_stats(spark, out_path)


SCENE_CUT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_diff", FloatType()),
        StructField("is_cut", StringType()),
    ]
)


def detect_scene_cuts(df: DataFrame, threshold: float = 30.0) -> DataFrame:
    """Scene-cut detection per video: mean absolute pixel difference
    between consecutive frames; a frame whose diff exceeds
    ``threshold`` gray levels starts a new shot. THE standard first
    pass of a video-corpus pipeline — frame sampling (sample_frames)
    should take shot boundaries, not a blind every-k, so near-static
    shots contribute one frame instead of hundreds of near-duplicates.

    A video's frames live in ONE row (container blob), so the
    consecutive-frame comparison is row-local inside the Arrow batch —
    no window over frame rows, no shuffle at all. Container-level
    frame splitting (mp4 sample table / fixed-size fake payloads)
    needs no codec; emits one row per frame transition with
    ``is_cut`` as 'cut'/'run' (string enum keeps the schema
    oracle-friendly)."""

    def _cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in SCENE_CUT_SCHEMA.fields]
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                nf = max(int(meta["n_frames"]) or 1, 1)
                if meta["format"] == "mp4":
                    from cds_etl_spark.operators.mp4 import extract_samples

                    frames = [
                        np.frombuffer(s, dtype=np.uint8).astype(np.float64)
                        for s in extract_samples(bytes(row["content"]))
                    ]
                else:
                    arr = _decode_bytes(row["content"], meta["format"])
                    flen = max(len(arr) // nf, 1)
                    frames = [
                        arr[i * flen : (i + 1) * flen].astype(np.float64)
                        for i in range(nf)
                    ]
                for i in range(1, len(frames)):
                    a, b = frames[i - 1], frames[i]
                    n = min(a.size, b.size)
                    d = float(np.abs(a[:n] - b[:n]).mean()) if n else 0.0
                    out.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i,
                            "frame_diff": d,
                            "is_cut": "cut" if d > threshold else "run",
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    pruned = df.filter(F.col("kind") == "video").select(
        "media_id", "content", "meta"
    )
    return pruned.mapInPandas(_cuts, schema=SCENE_CUT_SCHEMA)


# --------------------------------------------------------------------------
# Audio fingerprinting (landmark hashing) — content-based audio dedup
# --------------------------------------------------------------------------

AUDIO_FP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("fp_hash", LongType()),
        StructField("t", IntegerType()),
    ]
)


def audio_fingerprints(
    df: DataFrame,
    frame: int = 512,
    hop: int = 256,
    peaks_per_frame: int = 3,
    fanout: int = 3,
    max_dt: int = 32,
) -> DataFrame:
    """Landmark audio fingerprints (the classic spectral-peak-pair
    scheme of Wang 2003, "An Industrial-Strength Audio Search
    Algorithm"): STFT magnitude → per-frame local-maximum peaks →
    anchor/target peak pairs hashed as (f1, f2, Δt). A clip becomes a
    sparse set of (hash, anchor_time) rows — robust to level changes
    (peaks are relative maxima) and to time offset (Δt is
    anchor-relative; absolute offset is recovered at match time).
    This is the audio twin of ``phash64``: content-addressed identity
    that survives re-encoding, gain changes, and padding.

    Determinism: the spectrum is a fixed Hann-windowed numpy rFFT;
    peaks are STRICT local maxima ranked by (−magnitude, bin) via
    lexsort — stable under ties; pairing walks peaks in (t, bin)
    order taking the first ``fanout`` targets within ``max_dt``
    frames. Identical bytes → identical hash sets on any platform.

    Scale: Arrow-batched ``mapInPandas`` over a pruned
    (media_id, content) projection, zero shuffle; output is
    O(peaks × fanout) narrow rows per clip — the downstream match is
    a hash equi-join, never an all-pairs signal comparison."""

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_FP_SCHEMA.fields]
        win = np.hanning(frame)
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                samples, _rate = decode_wav(bytes(row["content"]))
                x = samples.astype(np.float64).mean(axis=1) / 32768.0
                if x.size < frame:
                    continue
                nf = (x.size - frame) // hop + 1
                idx = (
                    np.arange(nf)[:, None] * hop
                    + np.arange(frame)[None, :]
                )
                spec = np.abs(np.fft.rfft(x[idx] * win, axis=1))
                inner = spec[:, 1:-1]
                is_peak = (inner > spec[:, :-2]) & (inner > spec[:, 2:])
                peaks = []  # (t, bin) in deterministic order
                for t in range(nf):
                    bins = np.nonzero(is_peak[t])[0] + 1
                    if bins.size == 0:
                        continue
                    mags = spec[t, bins]
                    order = np.lexsort((bins, -mags))[:peaks_per_frame]
                    peaks.extend((t, int(bins[j])) for j in order)
                peaks.sort()
                for i, (t1, f1) in enumerate(peaks):
                    taken = 0
                    for t2, f2 in peaks[i + 1 :]:
                        if t2 == t1:
                            continue
                        if t2 - t1 > max_dt:
                            break
                        h = (f1 << 24) | (f2 << 12) | (t2 - t1)
                        out.append(
                            {
                                "media_id": row["media_id"],
                                "fp_hash": h,
                                "t": t1,
                            }
                        )
                        taken += 1
                        if taken >= fanout:
                            break
            yield pd.DataFrame(out, columns=cols)

    pruned = df.filter(F.col("kind") == "audio").select(
        "media_id", "content"
    )
    return pruned.mapInPandas(_fp, schema=AUDIO_FP_SCHEMA)


def match_audio_fingerprints(
    fps: DataFrame,
    min_votes: int = 5,
    max_hash_clips: int | None = None,
) -> DataFrame:
    """Content-match clip pairs from landmark fingerprints: equi-join
    on ``fp_hash``, then an OFFSET-CONSISTENCY vote — a true match's
    hash collisions concentrate at one Δt = t_a − t_b (the relative
    time offset of the two recordings), while chance collisions
    scatter. Votes = DISTINCT landmark hashes agreeing on the best
    single offset (distinct, not raw join rows: a sustained tone
    repeats one hash at many anchor times, which would otherwise
    spam k·l offset-aligned rows for a chance shared note — the
    melody evidence is how many DIFFERENT landmarks align). Pairs
    with ``votes >= min_votes`` are matches. Returns
    (id_a, id_b, offset, votes), id_a < id_b.

    Scale: the join key is a 36-bit landmark hash — selective by
    construction. ``max_hash_clips`` optionally drops hashes present
    in more than that many clips (the Zipf head of common spectral
    motifs — silence hum, test tones) BEFORE the self-join, the same
    hot-key guard as segment dedup's blocklist; with it the join is
    skew-bounded and the shuffle carries (id, hash, t) rows only."""
    if max_hash_clips is not None:
        hot = (
            fps.groupBy("fp_hash")
            .agg(F.count_distinct("media_id").alias("nc"))
            .filter(F.col("nc") > max_hash_clips)
            .select("fp_hash")
        )
        fps = fps.join(hot, "fp_hash", "left_anti")
    a = fps.alias("a")
    b = fps.alias("b")
    votes = (
        a.join(
            b,
            (F.col("a.fp_hash") == F.col("b.fp_hash"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            (F.col("a.t") - F.col("b.t")).alias("offset"),
        )
        .agg(F.count_distinct("a.fp_hash").alias("votes"))
    )
    w = Window.partitionBy("id_a", "id_b").orderBy(
        F.col("votes").desc(), F.col("offset")
    )
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("votes") >= min_votes))
        .select("id_a", "id_b", "offset", "votes")
    )
