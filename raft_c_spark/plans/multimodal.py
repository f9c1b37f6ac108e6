"""Driver-facing multimodal queries. The driver ships no media
parquet, so these run over the deterministic synthetic media table
(seeded, identical every run) — rows-only driver checks; the Spark
plumbing (binary columns, Arrow batching, row explosion) is the thing
under test, with correctness pinned by tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from raft_c_spark.operators import multimodal as mm


def q_mm_features(spark, sf_dir):
    """Feature extraction over every media row (image/audio/video) —
    payload → fixed-size vector via the Arrow-batched kernel; returns
    id, kind, and the feature norm (stable scalar summary)."""
    media = mm.synthetic_media(spark, n=128)
    feats = mm.extract_features(media)
    from raft_c_spark.operators.similarity import dot_fold

    return feats.select(
        "media_id",
        "kind",
        F.sqrt(dot_fold("features", "features")).alias("feature_norm"),
    )


def q_mm_frame_index(spark, sf_dir):
    """Video frame sampling (1 row per sampled frame) joined back to
    media metadata — the row-explosion + re-join shape of a real
    frame-indexing pipeline."""
    media = mm.synthetic_media(spark, n=128)
    frames = mm.sample_frames(media, every_ms=500)
    meta = media.select("media_id", "mime", "duration_ms")
    return (
        frames.join(F.broadcast(meta), "media_id")
        .groupBy("media_id", "mime", "duration_ms")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("frame_ts_ms").alias("last_frame_ms"),
        )
        .orderBy("media_id")
    )


def q_mm_real_decode(spark, sf_dir):
    """REAL decode path end-to-end: the synthetic PNG/WAV payloads are
    genuinely decoded (stdlib-only codecs — functions/png.py for
    images, ``wave`` for audio) and the features summarize actual
    pixels/samples, not payload bytes. Video is excluded (no stdlib
    codec — that decode stays an explicit NotImplementedError)."""
    media = mm.synthetic_media(spark, n=96).filter(
        F.col("kind").isin("image", "audio")
    )
    feats = mm.extract_features(media, decode="real")
    from raft_c_spark.operators.similarity import dot_fold

    return feats.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.sqrt(dot_fold("features", "features")).alias("feature_norm"),
    )


QUERIES = {
    # mm_real_decode (the stronger demonstration: genuinely decoded
    # pixels/samples) holds the multimodal family's window slot;
    # mm_features and mm_frame_index register via plans.extras behind
    # the driver's 50-query window — rows-only either way and
    # pytest-pinned, so their slots go to hash-oracled queries
    "mm_real_decode": q_mm_real_decode,
}

ORACLES: dict[str, str] = {}  # no media tables in the oracle's views
