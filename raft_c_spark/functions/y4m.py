"""Minimal stdlib-only YUV4MPEG2 (.y4m) video codec.

y4m is the uncompressed interchange format of the mjpegtools suite
(also read/written by ffmpeg): an ASCII stream header, then per frame
an ASCII ``FRAME`` marker followed by raw planar YCbCr data. With the
``C444`` colorspace every frame is three full-resolution h×w byte
planes — no compression, no chroma subsampling, so encode→decode is
bit-lossless, which the multimodal decode oracle depends on.

Scope: C444 8-bit progressive only (what our encoder emits); other
colorspaces raise ValueError naming the unsupported feature — the
explicit seam where a production codec (ffmpeg/av) plugs in.

Format reference: the public yuv4mpeg(5) man page (mjpegtools).
"""

from __future__ import annotations

import numpy as np

_MAGIC = b"YUV4MPEG2"


def y4m_encode(frames: "np.ndarray", fps: tuple[int, int] = (4, 1)) -> bytes:
    """Encode an (n_frames, h, w, 3) uint8 YCbCr array as a C444
    y4m stream."""
    arr = np.asarray(frames, dtype=np.uint8)
    if arr.ndim != 4 or arr.shape[3] != 3:
        raise ValueError(f"expected (n, h, w, 3) frames, got {arr.shape}")
    n, h, w, _ = arr.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode()
    parts = [header]
    for f in range(n):
        parts.append(b"FRAME\n")
        # planar layout: full Y plane, then Cb, then Cr
        for c in range(3):
            parts.append(arr[f, :, :, c].tobytes())
    return b"".join(parts)


def y4m_decode(data: bytes) -> tuple["np.ndarray", tuple[int, int]]:
    """Decode a C444 y4m stream to ((n_frames, h, w, 3) uint8, fps).
    Raises ValueError on a non-y4m payload or an unsupported
    colorspace/bit depth."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 stream (bad magic)")
    w = h = None
    fps = (0, 1)
    color = "C420jpeg"  # the format's default when no C tag is present
    for tok in data[len(_MAGIC) + 1 : nl].decode("ascii").split():
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps = (int(num), int(den))
        elif tok[0] == "C":
            color = tok
    if w is None or h is None:
        raise ValueError("y4m header missing W/H")
    if color != "C444":
        raise ValueError(f"unsupported y4m colorspace {color} (only C444)")
    frame_bytes = 3 * h * w
    pos, frames = nl + 1, []
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("corrupt y4m stream (missing FRAME marker)")
        pos = fnl + 1
        raw = data[pos : pos + frame_bytes]
        if len(raw) != frame_bytes:
            raise ValueError("corrupt y4m stream (truncated frame)")
        planes = np.frombuffer(raw, dtype=np.uint8).reshape(3, h, w)
        frames.append(np.stack([planes[0], planes[1], planes[2]], axis=2))
        pos += frame_bytes
    if not frames:
        return np.zeros((0, h, w, 3), dtype=np.uint8), fps
    return np.stack(frames), fps
