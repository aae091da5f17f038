"""Vectorized numpy port of Spark's XXH64 fixed-width hash steps.

Spark's ``xxhash64(col1, col2, ...)`` chains XXH64 one argument at a
time: ``hash = 42`` (the seed literal in HashExpression), then for a
BIGINT argument ``hash = hashLong(value, hash)`` and for an INTEGER
argument ``hash = hashInt(value, hash)`` (XXH64.java in spark-sketch;
behavior verified bit-exact against Spark 4.1 in
tests/test_dedup_similarity.py::test_numpy_xxh64_matches_spark).

Ported variants:
- ``hash_long`` / ``hash_int``: the fixed-width MinHash seed-fold hot
  path, where each of ``num_hashes`` passes re-hashes an 8-byte value.
- ``hash_bytes``: full variable-length XXH64 over ragged byte slices,
  vectorized ACROSS strings with masked chunk loops (r13: the JVM
  shingle+hash pass ran as interpreted higher-order functions and
  dominated the minhash lane; with this, shingling+hashing+folding all
  live in one Arrow batch).  Matches Spark's
  ``xxhash64(string_col)`` = XXH64(utf8_bytes, seed=42) bit-for-bit
  (tests/test_dedup_similarity.py::test_numpy_xxh64_bytes_matches_spark).

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


def _round(acc: np.ndarray, inp: np.ndarray) -> np.ndarray:
    return _rotl(acc + inp * _P2, 31) * _P1


def hash_bytes(buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray,
               seed=SPARK_SEED) -> np.ndarray:
    """XXH64 over N ragged byte slices ``buf[starts[i] : +lengths[i]]``,
    vectorized across slices (XXH64.hashUnsafeBytes semantics: 32-byte
    stripes, then 8-byte rounds, one 4-byte step, byte tail, fmix).

    ``buf`` must be uint8 with at least 8 readable bytes past the last
    slice end (callers pad); loop counts are bounded by the LONGEST
    slice, with masks deactivating finished ones — for shingle-sized
    inputs (~15-40 bytes) that is ~4 chunk passes total.
    """
    starts = np.asarray(starts, dtype=np.int64)
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(starts)
    h = np.empty(n, dtype=np.uint64)
    if n == 0:
        return h
    # one windowed view serves every unaligned 8-byte read as a gather
    win8 = np.lib.stride_tricks.sliding_window_view(buf, 8)

    def read8(offs):
        return np.ascontiguousarray(win8[offs]).view(np.uint64).ravel()

    seed = np.uint64(seed)
    pos = starts.copy()
    rem = lengths.copy()

    long_idx = np.where(lengths >= 32)[0]
    if len(long_idx):
        # python-int arithmetic: numpy SCALAR overflow warns, arrays wrap
        m64 = (1 << 64) - 1
        v1 = np.full(len(long_idx),
                     np.uint64((int(seed) + int(_P1) + int(_P2)) & m64))
        v2 = np.full(len(long_idx),
                     np.uint64((int(seed) + int(_P2)) & m64))
        v3 = np.full(len(long_idx), seed, dtype=np.uint64)
        v4 = np.full(len(long_idx),
                     np.uint64((int(seed) - int(_P1)) & m64))
        lpos = starts[long_idx].copy()
        lrem = lengths[long_idx].copy()
        active = lrem >= 32
        while active.any():
            a = np.where(active)[0]
            o = lpos[a]
            v1[a] = _round(v1[a], read8(o))
            v2[a] = _round(v2[a], read8(o + 8))
            v3[a] = _round(v3[a], read8(o + 16))
            v4[a] = _round(v4[a], read8(o + 24))
            lpos[a] += 32
            lrem[a] -= 32
            active[a] = lrem[a] >= 32
        hh = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18))
        for v in (v1, v2, v3, v4):
            hh = (hh ^ _round(np.zeros_like(v), v)) * _P1 + _P4
        h[long_idx] = hh
        pos[long_idx] = lpos
        rem[long_idx] = lrem
    short_mask = lengths < 32
    h[short_mask] = seed + _P5
    h += lengths.astype(np.uint64)

    active = rem >= 8
    while active.any():
        a = np.where(active)[0]
        k1 = _round(np.zeros(len(a), dtype=np.uint64), read8(pos[a]))
        h[a] = _rotl(h[a] ^ k1, 27) * _P1 + _P4
        pos[a] += 8
        rem[a] -= 8
        active[a] = rem[a] >= 8

    four = np.where(rem >= 4)[0]
    if len(four):
        o = four_pos = pos[four]
        idx = four_pos[:, None] + np.arange(4)
        b = buf[idx].astype(np.uint64)
        k = (b * (np.uint64(1) << (np.uint64(8)
                                   * np.arange(4, dtype=np.uint64)))).sum(
            axis=1, dtype=np.uint64)
        h[four] = _rotl(h[four] ^ (k * _P1), 23) * _P2 + _P3
        pos[four] += 4
        rem[four] -= 4

    active = rem >= 1
    while active.any():
        a = np.where(active)[0]
        b = buf[pos[a]].astype(np.uint64)
        h[a] = _rotl(h[a] ^ (b * _P5), 11) * _P1
        pos[a] += 1
        rem[a] -= 1
        active[a] = rem[a] >= 1

    return _fmix(h)
