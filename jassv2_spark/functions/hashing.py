"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` bit-for-bit.

Why this exists: the on-disk index layout buckets terms with the JVM
expression ``pmod(xxhash64(term), n_buckets)`` (plans/persist.py), and the
declarative serve path prunes buckets with the same expression via a tiny
Spark job (operators/search.py:_pruned_segments). The SaaT fast path's
workers, however, tokenize queries INSIDE a Python task (the tokenizer is
an Arrow UDF kernel), so they need the term→bucket rule without a round
trip to the JVM. This module is the standard public XXH64 algorithm
(Collet, https://github.com/Cyan4973/xxHash — algorithm spec, BSD; written
from the published spec, no code copied) with Spark's default seed 42,
verified bitwise against ``F.xxhash64`` in tests/test_hashing.py.

Reference parity note: the reference engine buckets its vocabulary with a
different hash entirely (top_k_qsort over the vocab,
``source/serialise_jass_v1.cpp``); the bucket rule here is an artifact of
OUR parquet layout, so the only parity that matters is Spark-vs-Python
self-consistency — which the test pins.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, word: int) -> int:
    return (_rotl((acc + word * _P2) & _MASK, 31) * _P1) & _MASK


def xxhash64(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """XXH64 of ``data``; returns the SIGNED 64-bit value Spark returns
    (two's complement), so ``xxhash64(t.encode())`` == ``F.xxhash64(t)``."""
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        limit = n - 32
        while pos <= limit:
            v1 = _round(v1, int.from_bytes(data[pos : pos + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[pos + 8 : pos + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[pos + 16 : pos + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[pos + 24 : pos + 32], "little"))
            pos += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while pos + 8 <= n:
        k1 = _round(0, int.from_bytes(data[pos : pos + 8], "little"))
        h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _MASK
        pos += 8
    if pos + 4 <= n:
        h = (_rotl(h ^ (int.from_bytes(data[pos : pos + 4], "little") * _P1) & _MASK, 23) * _P2 + _P3) & _MASK
        pos += 4
    while pos < n:
        h = (_rotl(h ^ (data[pos] * _P5) & _MASK, 11) * _P1) & _MASK
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket(term: str, n_buckets: int, seed: int = SPARK_XXHASH64_SEED) -> int:
    """``pmod(xxhash64(term), n_buckets)`` exactly as the JVM computes it:
    the signed hash, then a non-negative modulus (Python's ``%`` on a
    signed int IS pmod for positive n)."""
    return xxhash64(term.encode("utf-8"), seed) % n_buckets
