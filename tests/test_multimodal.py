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


def test_real_decode_images_and_audio(media):
    """decode='real' genuinely decodes: image features are pixel
    statistics (bounded in [0,1]-ish ranges), audio features are
    sample statistics — and both differ from the fake md5 features."""
    ia = media.filter(F.col("kind").isin("image", "audio"))
    real = {r["media_id"]: r for r in mm.extract_features(ia, decode="real").collect()}
    fake = {r["media_id"]: r for r in mm.extract_features(ia).collect()}
    assert len(real) == len(fake) > 0
    for mid, r in real.items():
        assert len(r["features"]) == mm.FEATURE_DIM
        assert r["features"] != fake[mid]["features"]
        if r["kind"] == "image":
            # channel means of uniform-random pixels: near 0.5
            assert all(0.3 < v < 0.7 for v in r["features"][:3]), r
        else:
            # rms of a 0.7-amp sine + 0.2-amp harmonic: ~0.51
            assert 0.3 < r["features"][0] < 0.7, r


def test_decode_stats_matches_preencode_ground_truth(media):
    """decode_stats (encode→PNG/WAV→decode→integer stats) must equal
    expected_decode_stats (stats straight off the pre-encode arrays):
    a lossless-roundtrip proof with no float tolerance anywhere."""
    ia = media.filter(F.col("kind").isin("image", "audio"))
    got = {
        r["media_id"]: r.asDict() for r in mm.decode_stats(ia).collect()
    }
    want = {d["media_id"]: d for d in mm.expected_decode_stats(n=30)}
    assert got.keys() == want.keys()
    for mid, w in want.items():
        assert got[mid] == w, (mid, got[mid], w)


def test_audio_features_empty_wav_guard():
    """A zero-frame WAV yields all-zero features, not a ValueError."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"")
    feats = mm._real_audio_features(buf.getvalue())
    assert feats == [0.0] * mm.FEATURE_DIM


def test_real_video_decode_is_explicitly_stubbed(media):
    vid = media.filter(F.col("kind") == "video")
    with pytest.raises(Exception) as ei:
        mm.extract_features(vid, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_real_resize_reencodes_pixels(media):
    """Real resize: output payloads are valid PNGs of the new size
    whose pixels are a nearest-neighbor selection of the originals."""
    import numpy as np

    from raft_c_spark.functions.png import png_decode, resize_nearest

    out = {
        r["media_id"]: r
        for r in mm.resize_images(media, 16, 12, decode="real").collect()
    }
    orig = {
        r["media_id"]: r
        for r in media.filter(F.col("kind") == "image").collect()
    }
    assert set(out) == set(orig)
    for mid, r in out.items():
        px = png_decode(bytes(r["payload"]))
        assert px.shape == (12, 16, 3)
        expect = resize_nearest(png_decode(bytes(orig[mid]["payload"])), 16, 12)
        assert np.array_equal(px, expect)
