"""Minimal stdlib-only PNG codec (zlib + struct + numpy) — the real
image decode path for the multimodal kernels in a container that ships
no media library.

Scope (deliberate): 8-bit-depth, non-interlaced grayscale / gray+alpha
/ RGB / RGBA — the subset every PNG encoder (including this one)
emits by default. All five scanline filters (None/Sub/Up/Average/
Paeth) are implemented, so PNGs produced by external tools decode
correctly as long as they stay in that subset; anything outside it
raises ValueError naming the unsupported feature.

Format reference: the public PNG specification (RFC 2083 / W3C
PNG spec) — chunk layout, IHDR fields, and filter recurrences are
implemented from the spec text.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"

#: IHDR color-type → sample count per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(pixels: "np.ndarray") -> bytes:
    """Encode an (h, w) or (h, w, channels) uint8 array as a PNG
    (filter 0 on every scanline — simple, always valid; compression
    is zlib's default level)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"unsupported channel count {ch}")
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> "np.ndarray":
    """Decode a PNG byte string to an (h, w, channels) uint8 array.
    Raises ValueError on a non-PNG payload or an unsupported variant
    (palette, 16-bit, interlaced)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, idat = 8, []
    w = h = depth = color = interlace = None
    while pos + 8 <= len(data):
        ln, tag = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        body = data[pos : pos + ln]
        pos += ln + 4  # skip CRC (we trust in-process payloads)
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color} (no palette)")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        p += 1
        line = np.frombuffer(raw[p : p + stride], dtype=np.uint8).copy()
        p += stride
        if f == 0:
            pass
        elif f == 1:  # Sub: left neighbor, sequential recurrence
            for i in range(ch, stride):
                line[i] = (int(line[i]) + int(line[i - ch])) & 0xFF
        elif f == 2:  # Up: vectorized (uint8 addition wraps mod 256)
            line += prev
        elif f == 3:  # Average
            for i in range(stride):
                a = int(line[i - ch]) if i >= ch else 0
                line[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                q = a + b - c
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = line
        prev = line
    return out.reshape(h, w, ch)


def resize_nearest(pixels: "np.ndarray", width: int, height: int) -> "np.ndarray":
    """Nearest-neighbor resize (the deterministic baseline every image
    pipeline starts from; bilinear is a production swap-in)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return pixels[ys][:, xs]
