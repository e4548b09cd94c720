"""Stable, vectorized 64-bit hashing kernels.

Replaces the reference's hash utilities (MurmurHash3 content hash,
``util/MurmurHash3.java:75-135``; fingerprint bit-packing,
``OlafFingerprint.java:154-196``) with NumPy-vectorized FNV-1a /
polynomial rolling hashes finalized by a splitmix64 mixer. Everything
here is pure (no process state, no PYTHONHASHSEED dependence) so results
are identical across workers, processes and parallelism levels — the
determinism requirement the reference pins with a constant-hash unit
test (``UtilsTest.java:33-43``).
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
FNV_OFFSET = U64(0xCBF29CE484222325)
FNV_PRIME = U64(0x100000001B3)
POLY_B = U64(0x9E3779B97F4A7C15)  # odd -> invertible multiplier mod 2^64

_MIX1 = U64(0xBF58476D1CE4E5B9)
_MIX2 = U64(0x94D049BB133111EB)


def mix64(x: np.ndarray | np.uint64) -> np.ndarray | np.uint64:
    """splitmix64 finalizer — bijective avalanche mix on uint64."""
    x = np.asarray(x, dtype=U64)
    x = (x ^ (x >> U64(30))) * _MIX1
    x = (x ^ (x >> U64(27))) * _MIX2
    return x ^ (x >> U64(31))


def fnv1a64(data: bytes) -> int:
    """Scalar FNV-1a over bytes (used for single words / small keys)."""
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash_strings_u64(strings, *, mixed: bool = True) -> np.ndarray:
    """Vectorized stable uint64 hash of a sequence of strings.

    Fast path: fixed-width numpy bytes matrix + column-wise masked FNV-1a
    (maxlen vectorized steps). Falls back to per-item FNV for non-ASCII.
    Padding is masked out so the result is independent of batch layout.
    """
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=U64)
    try:
        s = np.asarray(strings, dtype=np.bytes_)
    except (UnicodeEncodeError, ValueError):
        # Non-ASCII fallback must stay bit-identical to the fast path for
        # ASCII members (same FNV core + same finalizer), otherwise a
        # string's hash would depend on its batch neighbours.
        out = np.fromiter(
            (fnv1a64(x.encode("utf-8")) for x in strings), dtype=U64, count=n
        )
        return mix64(out) if mixed else out
    width = s.dtype.itemsize
    if width == 0:
        return np.full(n, mix64(FNV_OFFSET) if mixed else FNV_OFFSET, dtype=U64)
    mat = s.view(np.uint8).reshape(n, width)
    lengths = np.char.str_len(s)
    h = np.full(n, FNV_OFFSET, dtype=U64)
    for j in range(width):
        active = lengths > j
        if not active.any():
            break
        hj = (h ^ mat[:, j].astype(U64)) * FNV_PRIME
        h = np.where(active, hj, h)
    return mix64(h) if mixed else h


def rolling_hash_u64(data: np.ndarray, k: int) -> np.ndarray:
    """Polynomial rolling hash of every length-``k`` window of ``data``.

    ``data`` is a 1-D uint64 (or castable) array of symbols (bytes or
    word-hashes). Returns ``len(data) - k + 1`` mixed uint64 hashes.
    Horner evaluation: k vectorized passes, O(n) memory.
    """
    data = np.asarray(data, dtype=U64)
    n = data.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype=U64)
    h = np.zeros(n, dtype=U64)
    for j in range(k):
        h = h * POLY_B + data[j : j + n]
    return mix64(h)


def hash_pair_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two uint64 arrays into one."""
    a = np.asarray(a, dtype=U64)
    b = np.asarray(b, dtype=U64)
    return mix64(a * POLY_B + b)
