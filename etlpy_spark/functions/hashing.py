"""Python replica of Spark's ``xxhash64`` for LongType inputs.

Spark's builtin ``F.xxhash64`` is XXH64 with seed 42, hashing a long
column as its 8-byte value via the single-round specialization
(spark/sql/catalyst XXH64.hashLong). Serial oracles that must reproduce a
Spark plan's hash-dependent behavior (e.g. the hash-spread quantizer
sample in ``ivf_topk``) need the same function without a JVM —
tests/test_hashing.py proves this replica bit-identical to the builtin on
randomized inputs.

Only the LongType specialization is replicated (strings hash their UTF-8
byte stream through the full XXH64 loop — implement that only when an
oracle actually needs it).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def xxhash64_long(value: int, seed: int = 42) -> int:
    """XXH64 of one 64-bit value, Spark-compatible: same bits as
    ``F.xxhash64(col)`` for a LongType column (default seed 42). Accepts
    and returns SIGNED 64-bit ints (Spark LongType convention)."""
    v = value & _M
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h
