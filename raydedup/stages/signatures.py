"""Signature kernel: shingles -> MinHash-128 + SimHash-64 + LSH band keys.

This is the transplant of Panako's whole fingerprint M-block
(spectral transform -> peak picking -> event-point pairing -> 64-bit
hash; ``OlafEventPointProcessor.java:166-370``,
``OlafFingerprint.java:154-196``): one batched NumPy kernel applied via
``map_batches`` over zero-copy Arrow batches. The per-doc "fingerprint
set" is the set of hashed 5-gram shingles; the compact per-doc signature
is 128 MinHash components + one 64-bit SimHash; the index keys are 16
LSH band keys (16 bands x 8 rows) replacing the LMDB ``hash ->
(resourceID, t)`` postings (``PanakoStorageKV.java:204-228``).

Everything is deterministic from (text, DedupConfig seeds): permutation
tables are generated from a fixed seed, word hashing is stable FNV
(see ``raydedup.hashing``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.hashing import (
    U64,
    FNV_OFFSET,
    FNV_PRIME,
    fnv1a64,
    hash_strings_u64,
    mix64,
    rolling_hash_u64,
)

_EMPTY_U64 = np.empty(0, dtype=U64)


def minhash_perms(cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    """(a, b) multiply-shift permutation tables, fixed by cfg.minhash_seed."""
    rng = np.random.Generator(np.random.PCG64(cfg.minhash_seed))
    a = rng.integers(1, 2**64, size=cfg.n_perms, dtype=U64) | U64(1)  # odd
    b = rng.integers(0, 2**64, size=cfg.n_perms, dtype=U64)
    return a, b


def tokenize(text: str) -> list[str]:
    """Whitespace tokenization, lowercased. Deterministic and locale-free."""
    return text.lower().split()


class _WordHashCache:
    """Per-process cache word -> uint64 FNV-1a hash (Zipf text repeats words).

    Bounded: open-vocabulary web text (URLs, random strings, typos) would
    otherwise grow long-lived workers without limit. On overflow the cache
    resets — hashes are pure functions of the word, so a reset only costs
    recomputation, never correctness."""

    __slots__ = ("cache", "max_entries")

    def __init__(self, max_entries: int = 1 << 20) -> None:
        self.cache: dict[str, int] = {}
        self.max_entries = max_entries

    def hash_words(self, words: list[str]) -> np.ndarray:
        cache = self.cache
        if len(cache) > self.max_entries:
            cache.clear()
        out = np.empty(len(words), dtype=U64)
        for i, w in enumerate(words):
            h = cache.get(w)
            if h is None:
                h = fnv1a64(w.encode("utf-8"))
                cache[w] = h
            out[i] = h
        return out


_WORD_CACHE = _WordHashCache()


def shingle_hashes(text: str, cfg: DedupConfig) -> np.ndarray:
    """Sorted unique uint64 hashes of the doc's k-gram shingles.

    word mode: rolling combine over FNV word hashes; char mode: rolling
    polynomial hash over utf-8 bytes. Docs shorter than one shingle fall
    back to a single whole-text hash so every doc has a non-empty set.
    """
    if cfg.shingle_mode == "char":
        data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8)
        h = rolling_hash_u64(data, cfg.char_shingle_k)
    else:
        words = tokenize(text)
        wh = _WORD_CACHE.hash_words(words)
        h = rolling_hash_u64(wh, cfg.shingle_k)
    if h.shape[0] == 0:
        h = np.array([fnv1a64(text.encode("utf-8"))], dtype=U64)
    return np.unique(h)


def _token_hash_counts(text: str) -> tuple[np.ndarray, np.ndarray]:
    words = tokenize(text)
    if not words:
        return np.array([fnv1a64(b"")], dtype=U64), np.ones(1, dtype=np.int64)
    wh = _WORD_CACHE.hash_words(words)
    uniq, counts = np.unique(wh, return_counts=True)
    return uniq, counts


def minhash_batch(
    shingle_sets: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, n_perms) uint32 MinHash signatures, vectorized via reduceat.

    Concatenates all docs' shingle sets and computes permuted values in
    perm-chunks bounded to ~64 MB transient memory.
    """
    n_docs = len(shingle_sets)
    n_perms = a.shape[0]
    sig = np.empty((n_docs, n_perms), dtype=np.uint32)
    if n_docs == 0:
        return sig
    lens = np.fromiter((s.shape[0] for s in shingle_sets), dtype=np.int64, count=n_docs)
    offsets = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    allsh = np.concatenate(shingle_sets) if n_docs > 1 else shingle_sets[0]
    # Process doc-groups whose (shingles x 128 perms x 8 B) intermediate
    # fits in L2/L3 (~8 MB): the permuted-values matrix never touches
    # DRAM, which keeps concurrent tasks from fighting over memory
    # bandwidth (the kernel is traffic-bound, not FLOP-bound).
    group_shingles = 2048  # 2 MB working set: stays cache-resident even with a full pool of concurrent tasks
    ends = np.append(offsets[1:], allsh.shape[0])
    d0 = 0
    while d0 < n_docs:
        d1 = d0 + 1
        base = offsets[d0]
        while d1 < n_docs and ends[d1 - 1] - base < group_shingles:
            d1 += 1
        seg = allsh[base : ends[d1 - 1]]
        vals = seg[:, None] * a[None, :] + b[None, :]  # u64 wraparound
        mins = np.minimum.reduceat(vals, offsets[d0:d1] - base, axis=0)
        sig[d0:d1, :] = (mins >> U64(32)).astype(np.uint32)
        d0 = d1
    return sig


def simhash_batch(token_sets: list[tuple[np.ndarray, np.ndarray]]) -> np.ndarray:
    """(n_docs,) uint64 SimHash from (unique token hash, count) pairs."""
    n_docs = len(token_sets)
    out = np.zeros(n_docs, dtype=U64)
    if n_docs == 0:
        return out
    lens = np.fromiter((t[0].shape[0] for t in token_sets), dtype=np.int64, count=n_docs)
    offsets = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:])
    allh = np.concatenate([t[0] for t in token_sets])
    allw = np.concatenate([t[1] for t in token_sets]).astype(np.int64)
    for j in range(64):
        bit = ((allh >> U64(j)) & U64(1)).astype(np.int64)
        contrib = (2 * bit - 1) * allw
        sums = np.add.reduceat(contrib, offsets)
        out |= (sums > 0).astype(U64) << U64(j)
    return out


def band_keys(sig: np.ndarray, cfg: DedupConfig) -> np.ndarray:
    """(n_docs, n_bands) uint64 LSH band keys: FNV fold of each band's rows."""
    n_docs = sig.shape[0]
    rows = sig.reshape(n_docs, cfg.n_bands, cfg.rows_per_band).astype(U64)
    h = np.full((n_docs, cfg.n_bands), FNV_OFFSET, dtype=U64)
    for r in range(cfg.rows_per_band):
        h = (h ^ rows[:, :, r]) * FNV_PRIME
    # fold the band index in so identical row-slices in different bands differ
    h ^= np.arange(cfg.n_bands, dtype=U64)[None, :] * np.uint64(0x9E3779B97F4A7C15)
    return mix64(h)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(a ^ b) on uint64 (ref: util/Hamming.java:74-83)."""
    x = np.atleast_1d(np.asarray(a, dtype=U64) ^ np.asarray(b, dtype=U64))
    # byte-wise popcount via unpackbits on the raw view
    v = x.view(np.uint8).reshape(x.shape[0], 8)
    return np.unpackbits(v, axis=1).sum(axis=1)


class SignatureKernel:
    """Actor-pool batched kernel: docs batch -> signatures table.

    Stateful per-actor setup (permutation tables + word-hash cache) runs
    once in ``__init__`` (actor-pool pattern); ``__call__`` handles one
    Arrow batch. Input columns: ``doc_id`` (uint64), ``text`` (string).
    Output columns: doc_id, minhash (fixed list u32 x n_perms), simhash
    (u64), band keys (list u64 x n_bands), shingles (list u64, sorted
    unique), n_shingles (u32).
    """

    def __init__(self, cfg: DedupConfig | None = None, keep_shingles: bool = True):
        self.cfg = cfg or DedupConfig()
        self.a, self.b = minhash_perms(self.cfg)
        self.keep_shingles = keep_shingles

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id")
        # hash each doc's words ONCE; shingles and simhash tokens both
        # derive from the same word-hash array
        sets = []
        toks = []
        char_mode = cfg.shingle_mode == "char"
        for t in texts:
            t = t if t is not None else ""
            words = tokenize(t)
            wh = _WORD_CACHE.hash_words(words) if words else None
            if char_mode:
                sets.append(shingle_hashes(t, cfg))
            else:
                h = rolling_hash_u64(wh, cfg.shingle_k) if wh is not None else np.empty(0, U64)
                if h.shape[0] == 0:
                    h = np.array([fnv1a64(t.encode("utf-8"))], dtype=U64)
                sets.append(np.unique(h))
            if wh is None:
                toks.append((np.array([fnv1a64(b"")], dtype=U64), np.ones(1, dtype=np.int64)))
            else:
                uniq, counts = np.unique(wh, return_counts=True)
                toks.append((uniq, counts))
        sig = minhash_batch(sets, self.a, self.b)
        sim = simhash_batch(toks)
        bands = band_keys(sig, cfg)
        n = len(texts)
        cols: dict[str, pa.Array] = {}
        cols["doc_id"] = doc_ids.cast(pa.int64())
        cols["minhash"] = pa.FixedSizeListArray.from_arrays(
            pa.array(sig.reshape(-1), type=pa.uint32()), cfg.n_perms
        )
        cols["simhash"] = pa.array(sim, type=pa.uint64())
        cols["bands"] = pa.FixedSizeListArray.from_arrays(
            pa.array(bands.reshape(-1), type=pa.uint64()), cfg.n_bands
        )
        lens = np.fromiter((s.shape[0] for s in sets), dtype=np.int64, count=n)
        if self.keep_shingles:
            # packed little-endian uint64 bytes: Arrow acero joins support
            # binary payloads but not list columns; np.frombuffer restores
            # the sorted set zero-copy on the verify side
            cols["shingles"] = pa.array([s.tobytes() for s in sets], type=pa.large_binary())
        cols["n_shingles"] = pa.array(lens.astype(np.uint32), type=pa.uint32())
        return pa.table(cols)
