"""Multimodal plumbing tests: the decode kernels are deterministic
fakes (no media libs in the container), but the Spark mechanics —
schema, Arrow batching, row explosion, binary columns — are real."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from raft_c_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthetic_media(spark, n=30).cache()


def test_media_schema(media):
    assert media.schema == mm.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shape_and_determinism(media):
    out = mm.extract_features(media)
    rows = out.collect()
    assert len(rows) == 30
    assert all(len(r["features"]) == mm.FEATURE_DIM for r in rows)
    assert "payload" not in out.columns  # bytes dropped after extraction
    again = {r["media_id"]: r["features"] for r in mm.extract_features(media).collect()}
    first = {r["media_id"]: r["features"] for r in rows}
    assert again == first


def test_resize_updates_metadata_images_only(media):
    out = mm.resize_images(media, 224, 224)
    rows = out.collect()
    assert rows and all(r["kind"] == "image" for r in rows)
    assert all(r["width"] == 224 and r["height"] == 224 for r in rows)


def test_frame_sampling_explodes_rows(media):
    frames = mm.sample_frames(media, every_ms=500)
    rows = frames.collect()
    assert rows
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    for mid, frs in by_media.items():
        expect = max(durations[mid], 1) // 500 + (1 if durations[mid] % 500 else 0)
        assert len(frs) == expect
        idxs = sorted(f["frame_idx"] for f in frs)
        assert idxs == list(range(len(frs)))


def test_real_decode_is_explicitly_stubbed(media):
    with pytest.raises(Exception) as ei:
        mm.extract_features(media, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
