"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched pandas
iterators (mapInPandas).

The heavy codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are stubbed two ways:

- ``decode=\"fake\"`` (default in tests): a deterministic fake that
  derives features from the bytes (md5-seeded) — exercises the REAL
  Spark plumbing (schema, Arrow batching, partitioning, UDF
  signatures) end-to-end;
- ``decode=\"real\"``: raises NotImplementedError unless the optional
  library imports, marking exactly where production codecs plug in.

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


def _require_real_codec(kind: str) -> None:
    try:  # pragma: no cover - container has no media libs
        if kind == "image":
            import PIL  # noqa: F401
        elif kind == "audio":
            import soundfile  # noqa: F401
        else:
            import av  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"real {kind} decoding needs the optional codec library; "
            "this container ships none — use decode='fake' for pipeline "
            "testing, or install the codec in production"
        ) from None


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
                for kind in pdf["kind"].unique():
                    _require_real_codec(str(kind))
            feats = [_fake_features(bytes(p)) for p in pdf["payload"]]
            yield pdf[cols].assign(features=feats)

    return df.mapInPandas(kernel, out_schema)


def resize_images(df: DataFrame, width: int, height: int, decode: str = "fake") -> DataFrame:
    """Image resize kernel. Fake mode passes bytes through and updates
    the metadata (the plumbing under test: binary in/out schema, batch
    shape); real mode requires PIL."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                _require_real_codec("image")
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


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for pipeline tests (the
    driver ships no media parquet): payload bytes derived from the id."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{seed}-{i}".encode()).digest() * 8
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 32 if kind == "image" else None,
                48 + i % 24 if kind == "image" else None,
                1000 * (1 + i % 7) if kind != "image" else None,
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
