"""Round-trip and filter-coverage tests for the stdlib-only PNG codec."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from raft_c_spark.functions.png import png_decode, png_encode, resize_nearest


@pytest.mark.parametrize("shape", [(5, 7), (5, 7, 1), (8, 3, 2), (4, 6, 3), (2, 2, 4)])
def test_roundtrip_all_color_types(shape):
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = png_decode(png_encode(arr))
    expect = arr if arr.ndim == 3 else arr[:, :, None]
    assert np.array_equal(out, expect)


def _encode_with_filters(arr: np.ndarray, filters: list[int]) -> bytes:
    """Hand-roll an encoder applying a chosen filter per scanline, to
    exercise every decoder unfilter branch (our encoder only emits 0)."""
    h, w, ch = arr.shape
    stride = w * ch
    prev = np.zeros(stride, dtype=np.int64)
    raw = bytearray()
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)]
        enc = np.empty(stride, dtype=np.int64)
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw.extend(int(v) for v in enc)
        prev = line
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 2: 4, 3: 2, 4: 6}[ch], 0, 0, 0)
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_every_filter(filters):
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(_encode_with_filters(arr, filters)), arr)


def test_rejects_non_png():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"\x00" * 64)


def test_rejects_unsupported_depth():
    arr = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(png_encode(arr))
    # IHDR bit-depth byte sits at offset 8(sig)+8(len/tag)+8(w/h)
    data[24] = 16
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(bytes(data))


def test_resize_nearest_shape_and_identity():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    assert np.array_equal(resize_nearest(arr, 8, 10), arr)
    small = resize_nearest(arr, 4, 5)
    assert small.shape == (5, 4, 3)
    assert np.array_equal(small, arr[::2][:, ::2])
