"""Vectorized numpy port of Spark's XXH64 fixed-width hash steps.

Spark's ``xxhash64(col1, col2, ...)`` chains XXH64 one argument at a
time: ``hash = 42`` (the seed literal in HashExpression), then for a
BIGINT argument ``hash = hashLong(value, hash)`` and for an INTEGER
argument ``hash = hashInt(value, hash)`` (XXH64.java in spark-sketch;
behavior verified bit-exact against Spark 4.1 in
tests/test_dedup_similarity.py::test_numpy_xxh64_matches_spark).

Only the two fixed-width variants are ported — they are the MinHash
seed-fold hot path, where each of ``num_hashes`` passes re-hashes an
8-byte value.  Variable-length string hashing stays JVM-side (one pass
over the strings, amortized across all seeds).

All functions operate on / return ``np.uint64`` arrays with silent
modular wraparound (numpy unsigned overflow semantics == Java's
overflowing long arithmetic); callers reinterpret with
``.view(np.int64)`` when signed comparisons (array_min parity) matter.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

SPARK_SEED = np.uint64(42)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h: np.ndarray) -> np.ndarray:
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def hash_long(x: np.ndarray, seed) -> np.ndarray:
    """XXH64.hashLong: 8-byte input, vectorized over ``x`` (uint64).
    ``seed`` may be scalar or an array broadcastable with ``x``."""
    h = np.uint64(seed) + (_P5 + np.uint64(8))
    h = h ^ _rotl(x * _P2, 31) * _P1
    h = _rotl(h, 27) * _P1 + _P4
    return _fmix(h)


def hash_int(x, seed) -> np.ndarray:
    """XXH64.hashInt: 4-byte input, vectorized over ``seed`` (uint64
    array) with ``x`` typically a scalar (the MinHash seed index)."""
    h = np.asarray(seed, dtype=np.uint64) + (_P5 + np.uint64(4))
    # scalar product in Python ints: numpy SCALAR ops warn on overflow
    # (array ops wrap silently), and x is a plain seed index here
    xk = np.uint64(((int(x) & 0xFFFFFFFF) * int(_P1))
                   & 0xFFFFFFFFFFFFFFFF)
    h = h ^ xk
    h = _rotl(h, 23) * _P2 + _P3
    return _fmix(h)
