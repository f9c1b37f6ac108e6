"""Pure-Python replay of Spark's ``xxhash64`` for LongType inputs.

Several oracles replay deterministic pipelines that sample or bucket
rows with ``F.pmod(F.xxhash64(col), denom)`` (e.g. the IVF fit sample
above ``IVF_FIT_SAMPLE_CAP``). To keep those replays bit-identical
without a SparkSession, this module reimplements the public xxHash64
algorithm (Yann Collet, BSD — spec at github.com/Cyan4973/xxHash)
exactly as Spark's ``XXH64.hashLong`` applies it: the long is hashed
as one little-endian 8-byte lane with Spark's default seed 42.

Pinned against Spark's own ``F.xxhash64`` over a value sweep in
``tests/test_text_similarity.py`` so any divergence fails loudly.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxhash64_long(value: int, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Spark-signed xxhash64 of a single long (two's-complement in,
    two's-complement out — matching the JVM's signed 64-bit Long)."""
    inp = value & _M64  # two's-complement bit pattern
    h = (seed + _P5 + 8) & _M64
    h ^= (_rotl((inp * _P2) & _M64, 31) * _P1) & _M64
    h = ((_rotl(h, 27) * _P1) + _P4) & _M64
    # fmix avalanche
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    # back to signed
    return h - (1 << 64) if h >= (1 << 63) else h


def pmod_xxhash64_long(value: int, denom: int) -> int:
    """``F.pmod(F.xxhash64(value), denom)`` for a long column: Python's
    ``%`` on the signed hash already yields the non-negative residue
    pmod defines."""
    return xxhash64_long(value) % denom
