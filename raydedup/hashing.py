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


# POLY_B is odd, hence invertible mod 2^64; Newton iteration doubles the
# valid low bits each step (5 steps from an odd seed covers 64 bits).
# Wraparound is the point — mask numpy's overflow warning for the setup.
with np.errstate(over="ignore"):
    _POLY_B_INV = POLY_B
    for _ in range(6):
        _POLY_B_INV = _POLY_B_INV * (U64(2) - POLY_B * _POLY_B_INV)
    assert POLY_B * _POLY_B_INV == U64(1)

# per-process cached power tables B^i / B^-i (grow-on-demand; ~8 bytes
# per element, callers chunk long inputs so these stay modest)
_PW = np.array([1], dtype=U64)
_IPW = np.array([1], dtype=U64)


def _powers(n: int) -> tuple[np.ndarray, np.ndarray]:
    global _PW, _IPW
    if _PW.shape[0] <= n:
        m = max(n + 1, 2 * _PW.shape[0])
        pw = np.empty(m, dtype=U64)
        pw[0] = U64(1)
        np.multiply.accumulate(np.full(m - 1, POLY_B, dtype=U64), dtype=U64, out=pw[1:])
        ipw = np.empty(m, dtype=U64)
        ipw[0] = U64(1)
        np.multiply.accumulate(
            np.full(m - 1, _POLY_B_INV, dtype=U64), dtype=U64, out=ipw[1:]
        )
        _PW, _IPW = pw, ipw
    return _PW, _IPW


def rolling_hash_u64(data: np.ndarray, k: int) -> np.ndarray:
    """Polynomial rolling hash of every length-``k`` window of ``data``.

    ``data`` is a 1-D uint64 (or castable) array of symbols (bytes or
    word-hashes). Returns ``len(data) - k + 1`` mixed uint64 hashes.

    Computed via the O(n) prefix trick instead of k Horner passes:
    with Q'[p] = sum_{j<p} b[j]*B^-j (cumsum of b[j]*B^-j, exact mod
    2^64 since B is odd/invertible), the window polynomial is
    h(p) = (Q'[p+k] - Q'[p]) * B^(p+k-1) — bit-identical to Horner
    (pytest-pinned) at ~6 ops/position regardless of k. Power tables
    are cached per process.
    """
    data = np.asarray(data)
    if data.dtype not in (U64, np.uint8):
        data = data.astype(U64)  # signed dtypes would upcast mul to float64
    N = data.shape[0]
    n = N - k + 1
    if n <= 0:
        return np.empty(0, dtype=U64)
    if N < 64 or k <= 2:
        # tiny inputs: Horner avoids the table slices
        d = data.astype(U64, copy=False)
        h = np.zeros(n, dtype=U64)
        for j in range(k):
            h = h * POLY_B + d[j : j + n]
        return mix64(h)
    pw, ipw = _powers(N + k)
    terms = data * ipw[:N]  # upcasts to uint64, wraps mod 2^64
    q = np.empty(N + 1, dtype=U64)
    q[0] = U64(0)
    np.cumsum(terms, dtype=U64, out=q[1:])
    h = (q[k : k + n] - q[:n]) * pw[k - 1 : k - 1 + n]
    return mix64(h)


def span_hash_u64(offsets: np.ndarray, data: np.ndarray) -> np.ndarray:
    """Polynomial hash of each variable-length span ``[offsets[i],
    offsets[i+1])`` of ``data`` (a flat uint8 buffer), with the span
    LENGTH folded in so prefix-sharing spans of different lengths and
    the empty span all get distinct, defined values.

    Same prefix trick as :func:`rolling_hash_u64` — one cumsum over the
    buffer, then O(1) per span — so hashing a batch of documents costs
    O(total bytes), independent of document count or length skew.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    n = offsets.shape[0] - 1
    if n <= 0:
        return np.empty(0, dtype=U64)
    data = np.asarray(data)
    if data.dtype != np.uint8:
        data = data.astype(U64)
    N = data.shape[0]
    pw, ipw = _powers(N + 1)
    terms = data * ipw[:N]
    q = np.empty(N + 1, dtype=U64)
    q[0] = U64(0)
    np.cumsum(terms, dtype=U64, out=q[1:])
    a, b = offsets[:-1], offsets[1:]
    # span poly = (q[b] - q[a]) * B^(b-1); empty spans (b == a) get raw 0
    raw = (q[b] - q[a]) * pw[np.maximum(b - 1, 0)]
    raw[b == a] = U64(0)
    return hash_pair_u64(raw, (b - a).astype(U64))


def hash_pair_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Order-sensitive combine of two uint64 arrays into one."""
    a = np.asarray(a, dtype=U64)
    b = np.asarray(b, dtype=U64)
    return mix64(a * POLY_B + b)
