"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched pandas
iterators (mapInPandas).

Decode modes:

- ``decode=\"fake\"`` (default in tests): a deterministic fake that
  derives features from the bytes (md5-seeded) — exercises the REAL
  Spark plumbing (schema, Arrow batching, partitioning, UDF
  signatures) end-to-end without interpreting the payload;
- ``decode=\"real\"``: genuinely decodes the payload. Images go
  through the stdlib-only PNG codec (functions/png.py — zlib +
  struct, all five scanline filters) and audio through the stdlib
  ``wave`` module; both compute features from actual pixels/samples.
  Video has no stdlib codec, so it raises NotImplementedError,
  marking exactly where a production codec (ffmpeg/av) plugs in.

Scale notes: media bytes never pass through a shuffle — all kernels
are narrow mapInPandas transforms; only extracted features (small,
fixed-size) flow into joins/aggregations downstream. Batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so a
partition of large blobs doesn't blow executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as Ty

#: media row schema: opaque payload + typed metadata (the engine never
#: interprets the bytes outside a decode kernel)
MEDIA_SCHEMA = Ty.StructType(
    [
        Ty.StructField("media_id", Ty.LongType(), False),
        Ty.StructField("kind", Ty.StringType(), False),  # image|audio|video
        Ty.StructField("payload", Ty.BinaryType(), False),
        Ty.StructField("mime", Ty.StringType(), True),
        Ty.StructField("width", Ty.IntegerType(), True),
        Ty.StructField("height", Ty.IntegerType(), True),
        Ty.StructField("duration_ms", Ty.LongType(), True),
    ]
)

FEATURE_DIM = 16

_FEATURES_FIELD = Ty.StructField(
    "features", Ty.ArrayType(Ty.FloatType()), True
)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decode+embed kernel: md5 of the
    bytes → seeded uniform features. Stable across runs/engines."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.uniform(-1.0, 1.0, dim)]


def _real_image_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Decode the PNG and summarize actual pixels: per-RGB-channel
    mean/std (6), an 8-bin luminance histogram (8), overall mean/std
    (2) → 16 floats. Grayscale replicates its channel stats."""
    from raft_c_spark.functions.png import png_decode

    px = png_decode(payload).astype(np.float64) / 255.0
    if px.shape[2] == 1:
        rgb = np.repeat(px, 3, axis=2)
    else:
        rgb = px[:, :, :3]
    luma = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    hist, _ = np.histogram(luma, bins=8, range=(0.0, 1.0))
    hist = hist / luma.size
    feats = np.concatenate(
        [
            rgb.mean(axis=(0, 1)),
            rgb.std(axis=(0, 1)),
            hist,
            [rgb.mean(), rgb.std()],
        ]
    )
    return [float(x) for x in feats[:dim]]


def _real_audio_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Decode 16-bit PCM WAV (stdlib ``wave``) and summarize actual
    samples: rms, zero-crossing rate, mean/std/peak of |x|, an 8-bin
    |x| histogram, duration seconds, channel count, sample rate / 1e5
    → 16 floats."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        n, rate, ch = wf.getnframes(), wf.getframerate(), wf.getnchannels()
        if wf.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        x = np.frombuffer(wf.readframes(n), dtype=np.int16).astype(np.float64)
    if len(x) == 0:
        # a zero-frame WAV is valid; all-zero features instead of the
        # ValueError ax.max() would raise on an empty array (one
        # malformed row must not fail the whole mapInPandas task)
        return [0.0] * dim
    x /= 32768.0
    ax = np.abs(x)
    zcr = float(np.mean(np.signbit(x[:-1]) != np.signbit(x[1:]))) if len(x) > 1 else 0.0
    hist, _ = np.histogram(ax, bins=8, range=(0.0, 1.0))
    hist = hist / max(len(x), 1)
    feats = np.concatenate(
        [
            [np.sqrt(np.mean(x * x)), zcr, ax.mean(), ax.std(), ax.max()],
            hist,
            [n / rate, float(ch), rate / 1e5],
        ]
    )
    return [float(v) for v in feats[:dim]]


def _real_features(kind: str, payload: bytes) -> list[float]:
    if kind == "image":
        return _real_image_features(payload)
    if kind == "audio":
        return _real_audio_features(payload)
    raise NotImplementedError(
        "real video decoding needs a codec library (ffmpeg/av) this "
        "container doesn't ship — use decode='fake' for pipeline "
        "testing, or install the codec in production"
    )


def extract_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """payload → fixed-size feature vector, per-batch via mapInPandas
    (Arrow transfer, no per-row python overhead)."""
    out_schema = Ty.StructType(
        [f for f in df.schema.fields if f.name != "payload"] + [_FEATURES_FIELD]
    )
    cols = [f.name for f in out_schema.fields if f.name != "features"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                feats = [
                    _real_features(str(k), bytes(p))
                    for k, p in zip(pdf["kind"], pdf["payload"])
                ]
            else:
                feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pdf[cols].assign(features=feats)

    return df.mapInPandas(kernel, out_schema)


#: exact-integer decode summary — hash-stable across engines (no
#: float arithmetic), so the driver's DuckDB oracle can verify the
#: real decode path bit-for-bit
DECODE_STATS_SCHEMA = Ty.StructType(
    [
        Ty.StructField("media_id", Ty.LongType(), False),
        Ty.StructField("kind", Ty.StringType(), False),
        Ty.StructField("width", Ty.LongType(), True),
        Ty.StructField("height", Ty.LongType(), True),
        Ty.StructField("n_units", Ty.LongType(), False),
        Ty.StructField("val_sum", Ty.LongType(), False),
        Ty.StructField("val_min", Ty.LongType(), True),
        Ty.StructField("val_max", Ty.LongType(), True),
    ]
)

_DECODE_STATS_COLS = [f.name for f in DECODE_STATS_SCHEMA.fields]


def _pixel_stats(px: "np.ndarray") -> dict:
    """Exact integer stats over a decoded (h, w, ch) uint8 array.
    n_units counts samples (w*h*ch); sums are exact int64."""
    flat = px.astype(np.int64)
    return {
        "width": int(px.shape[1]),
        "height": int(px.shape[0]),
        "n_units": int(px.size),
        "val_sum": int(flat.sum()),
        "val_min": int(px.min()) if px.size else None,
        "val_max": int(px.max()) if px.size else None,
    }


def _sample_stats(pcm: "np.ndarray") -> dict:
    """Exact integer stats over int16 PCM samples: n_units = sample
    count, val_sum = sum of |sample| (int64-exact)."""
    x = np.asarray(pcm, dtype=np.int64)
    return {
        "width": None,
        "height": None,
        "n_units": int(len(x)),
        "val_sum": int(np.abs(x).sum()),
        "val_min": int(x.min()) if len(x) else None,
        "val_max": int(x.max()) if len(x) else None,
    }


def decode_stats(df: DataFrame) -> DataFrame:
    """Genuinely decode every image/audio payload (stdlib PNG codec /
    ``wave``) and emit exact-integer pixel/sample statistics — the
    driver-verifiable face of the real decode path: the numbers match
    the pre-encode ground truth (``expected_decode_stats``) only if
    the PNG/WAV encode→decode round-trip is lossless.

    Arrow-batched ``mapInPandas``; payload bytes never shuffle."""
    from raft_c_spark.functions.png import png_decode

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind == "image":
                    stats = _pixel_stats(png_decode(bytes(payload)))
                elif kind == "audio":
                    with wave.open(io.BytesIO(bytes(payload)), "rb") as wf:
                        if wf.getsampwidth() != 2:
                            raise ValueError("only 16-bit PCM WAV supported")
                        pcm = np.frombuffer(
                            wf.readframes(wf.getnframes()), dtype="<i2"
                        )
                    stats = _sample_stats(pcm)
                else:
                    raise NotImplementedError(
                        f"decode_stats: no stdlib codec for kind={kind}"
                    )
                rows.append({"media_id": int(mid), "kind": str(kind), **stats})
            yield pd.DataFrame(rows, columns=_DECODE_STATS_COLS)

    return df.select("media_id", "kind", "payload").mapInPandas(
        kernel, DECODE_STATS_SCHEMA
    )


def expected_decode_stats(n: int = 64, seed: int = 42) -> list[dict]:
    """Ground-truth decode stats for ``synthetic_media(n, seed)``,
    computed directly from the PRE-ENCODE raw arrays (synthetic_pixels
    / synthetic_pcm) — deliberately never touching the PNG/WAV codecs,
    so comparing against ``decode_stats`` verifies the whole
    encode→decode round-trip. Pure Python+numpy (no Spark): the
    oracle side materializes this without a session."""
    out = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = 64 + i % 32, 48 + i % 24
            stats = _pixel_stats(synthetic_pixels(i, seed, w, h))
        elif kind == "audio":
            dur = 1000 * (1 + i % 7)
            stats = _sample_stats(synthetic_pcm(i, seed, dur))
        else:
            continue  # video payloads are opaque (no stdlib codec)
        out.append({"media_id": i, "kind": kind, **stats})
    return out


def resize_images(df: DataFrame, width: int, height: int, decode: str = "fake") -> DataFrame:
    """Image resize kernel. Fake mode passes bytes through and updates
    the metadata (the plumbing under test: binary in/out schema, batch
    shape); real mode decodes the PNG, nearest-neighbor resizes the
    pixel array, and re-encodes."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if decode == "real":
            from raft_c_spark.functions.png import (
                png_decode,
                png_encode,
                resize_nearest,
            )
        for pdf in batches:
            if decode == "real":
                pdf = pdf.assign(
                    payload=[
                        png_encode(resize_nearest(png_decode(bytes(p)), width, height))
                        for p in pdf["payload"]
                    ]
                )
            yield pdf.assign(width=width, height=height)

    return df.filter(F.col("kind") == "image").mapInPandas(kernel, df.schema)


def sample_frames(
    df: DataFrame, every_ms: int, decode: str = "fake"
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame
    (media_id, frame_idx, frame_ts_ms, features). Fake mode derives
    frame count from duration_ms and features from (payload,
    frame_idx) — the real row-explosion shape without a codec."""
    out_schema = Ty.StructType(
        [
            Ty.StructField("media_id", Ty.LongType(), False),
            Ty.StructField("frame_idx", Ty.IntegerType(), False),
            Ty.StructField("frame_ts_ms", Ty.LongType(), False),
            _FEATURES_FIELD,
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                _require_real_codec("video")
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                for idx, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": idx,
                            "frame_ts_ms": ts,
                            "features": _fake_features(
                                bytes(r["payload"]) + idx.to_bytes(4, "big")
                            ),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "features"]
            )

    return df.filter(F.col("kind") == "video").mapInPandas(kernel, out_schema)


def synthetic_pixels(i: int, seed: int, w: int, h: int) -> "np.ndarray":
    """Raw (h, w, 3) uint8 pixel array for synthetic image ``i`` —
    the pre-encode ground truth that ``expected_decode_stats`` and
    the PNG payload both derive from."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def synthetic_pcm(
    i: int, seed: int, duration_ms: int, rate: int = 8000
) -> "np.ndarray":
    """Raw little-endian int16 PCM samples (seeded sine + harmonic)
    for synthetic audio ``i`` — the pre-encode ground truth."""
    freq = 110.0 * (1 + (seed + i) % 16)
    t = np.arange(int(rate * duration_ms / 1000)) / rate
    x = 0.7 * np.sin(2 * np.pi * freq * t) + 0.2 * np.sin(2 * np.pi * 3 * freq * t)
    return (x * 32767).astype("<i2")


def _synthetic_png(i: int, seed: int, w: int, h: int) -> bytes:
    """A real, decodable PNG: seeded-random RGB pixels."""
    from raft_c_spark.functions.png import png_encode

    return png_encode(synthetic_pixels(i, seed, w, h))


def _synthetic_wav(i: int, seed: int, duration_ms: int, rate: int = 8000) -> bytes:
    """A real, decodable 16-bit PCM WAV: a seeded sine + harmonic."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(synthetic_pcm(i, seed, duration_ms, rate).tobytes())
    return buf.getvalue()


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for pipeline tests (the
    driver ships no media parquet). Image payloads are real PNGs and
    audio payloads real WAVs — the ``decode="real"`` kernels decode
    them for actual pixel/sample features; video payloads stay opaque
    bytes (no stdlib video codec)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w = 64 + i % 32 if kind == "image" else None
        h = 48 + i % 24 if kind == "image" else None
        dur = 1000 * (1 + i % 7) if kind != "image" else None
        if kind == "image":
            payload = _synthetic_png(i, seed, w, h)
        elif kind == "audio":
            payload = _synthetic_wav(i, seed, dur)
        else:
            payload = hashlib.sha256(f"media-{seed}-{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                w,
                h,
                dur,
            )
        )
    # hand the rows over as a pandas frame: createDataFrame(list) takes
    # the pickled-RDD path (one python task per partition, ~2s for a
    # hundred rows); the pandas route transfers one Arrow batch
    pdf = pd.DataFrame(
        rows, columns=[f.name for f in MEDIA_SCHEMA.fields]
    ).astype(object)
    pdf = pdf.where(pdf.notna(), None)
    return spark.createDataFrame(pdf, MEDIA_SCHEMA)
