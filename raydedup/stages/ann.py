"""Similarity search over embedding columns (list<float>).

Training-data-pipeline extension (BASELINE.md graft targets): top-k
cosine similarity against a broadcast query matrix. Two paths:

- brute force: numpy matmul per batch against the ray.put query matrix
  (the PCH brute-force scorer analog — compare against everything,
  ``strategy/pch/PitchClassHistogramStrategy.java:149-217``)
- IVF: k-means-lite coarse quantizer (fixed seed, few Lloyd rounds on a
  sample); vectors are bucketed by nearest centroid and only the
  ``n_probe`` closest buckets are scanned — the scale path.

Embedding-cosine near-duplicate pairs reuse the same bucketing: docs
whose embeddings land in the same coarse bucket are candidate pairs,
verified by exact cosine (mirrors LSH band -> verify).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _batch_matrix(batch: pa.Table, col: str, dtype=np.float64) -> np.ndarray:
    arr = batch.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.maximum(norms, 1e-12)


def knn_cosine_bruteforce(
    embeddings: Dataset,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact top-k cosine: per-batch matmul against the broadcast query,
    per-batch local top-k, global top-k merge on the driver (merge input
    is k rows per batch, not the dataset)."""
    qn = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    q_ref = ray.put(qn)

    def topk_batch(batch: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = (m @ q.T).ravel()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        take = min(k, sims.shape[0])
        idx = np.argpartition(-sims, take - 1)[:take]
        return pa.table(
            {
                id_col: pa.array(ids[idx]),
                "cosine": pa.array(sims[idx].astype(np.float64), type=pa.float64()),
            }
        )

    local = embeddings.select_columns([id_col, vec_col]).map_batches(
        topk_batch, batch_format="pyarrow"
    )
    df = local.to_pandas()
    df = df.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
    return df.head(k).reset_index(drop=True)


def train_centroids(
    embeddings: Dataset,
    n_centroids: int = 16,
    sample_rows: int = 4096,
    rounds: int = 5,
    seed: int = 0x5EED_0C0C,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic k-means-lite on a driver-side sample (the coarse
    quantizer is tiny state, broadcast everywhere — never shuffled)."""
    sample = embeddings.limit(sample_rows).to_pandas()
    m = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in sample[vec_col]])
    )
    rng = np.random.Generator(np.random.PCG64(seed))
    init = rng.choice(m.shape[0], size=min(n_centroids, m.shape[0]), replace=False)
    cents = m[np.sort(init)].copy()
    for _ in range(rounds):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(cents.shape[0]):
            members = m[assign == c]
            if members.shape[0]:
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def knn_cosine_ivf(
    embeddings: Dataset,
    query: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF approximate top-k: scan only the n_probe buckets whose
    centroids are closest to the query (bucket filter inside map_batches
    against broadcast centroids — no shuffle)."""
    cents = train_centroids(embeddings, n_centroids=n_centroids, vec_col=vec_col)
    qn = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    probe = np.argsort(-(cents @ qn.T).ravel())[:n_probe]
    cents_ref = ray.put(cents)
    probe_ref = ray.put(np.sort(probe))
    q_ref = ray.put(qn)

    def topk_batch(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        pr = ray.get(probe_ref)
        q = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        assign = np.argmax(m @ c.T, axis=1)
        mask = np.isin(assign, pr)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[mask]
        sims = (m[mask] @ q.T).ravel()
        take = min(k, sims.shape[0])
        if take == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
        idx = np.argpartition(-sims, take - 1)[:take]
        return pa.table(
            {
                id_col: pa.array(ids[idx]),
                "cosine": pa.array(sims[idx].astype(np.float64), type=pa.float64()),
            }
        )

    local = embeddings.select_columns([id_col, vec_col]).map_batches(
        topk_batch, batch_format="pyarrow"
    )
    df = local.to_pandas()
    df = df.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
    return df.head(k).reset_index(drop=True)


def embedding_neardup_pairs(
    embeddings: Dataset,
    threshold: float = 0.95,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs: bucket by nearest centroid
    (coarse LSH analog), all-pairs cosine inside each bucket, keep
    pairs >= threshold, a < b. Exact within buckets; pairs split across
    buckets are the (rare, documented) approximation."""
    cents = train_centroids(embeddings, n_centroids=n_centroids, vec_col=vec_col)
    cents_ref = ray.put(cents)

    def bucketize(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        assign = np.argmax(m @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(assign, type=pa.int64()),
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
            }
        )

    bucketed = embeddings.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pyarrow"
    )

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy().astype(np.int64)
        m = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]]))
        sims = m @ m.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] >= threshold
        a = np.minimum(ids[ii[keep]], ids[jj[keep]])
        b = np.maximum(ids[ii[keep]], ids[jj[keep]])
        return pd.DataFrame(
            {"a": a, "b": b, "cosine": sims[ii[keep], jj[keep]].astype(np.float64)}
        )

    out = bucketed.groupby("bucket").map_groups(pairs_in_bucket, batch_format="pandas")
    return out.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)


def knn_cosine_lsh(
    embeddings: Dataset,
    query: np.ndarray,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 0x5EED_11A5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Random-hyperplane (sign) LSH top-k: vectors sharing the query's
    sign-pattern bucket in ANY of ``n_tables`` tables are scanned
    exactly. Alternative scale path to IVF (no training pass; buckets
    are data-independent)."""
    dim = np.asarray(query).shape[-1]
    rng = np.random.Generator(np.random.PCG64(seed))
    planes = rng.normal(size=(n_tables, n_planes, dim))
    qn = _normalize(np.asarray(query, dtype=np.float64).reshape(1, -1))
    q_codes = np.array(
        [int((planes[t] @ qn.ravel() > 0).astype(np.uint64) @ (1 << np.arange(n_planes, dtype=np.uint64))) for t in range(n_tables)],
        dtype=np.uint64,
    )
    planes_ref = ray.put(planes)
    qcodes_ref = ray.put(q_codes)
    q_ref = ray.put(qn)

    def topk_batch(batch: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        qc = ray.get(qcodes_ref)
        q = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        powers = 1 << np.arange(pl.shape[1], dtype=np.uint64)
        mask = np.zeros(m.shape[0], dtype=bool)
        for t in range(pl.shape[0]):
            codes = ((m @ pl[t].T) > 0).astype(np.uint64) @ powers
            mask |= codes == qc[t]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[mask]
        sims = (m[mask] @ q.T).ravel()
        take = min(k, sims.shape[0])
        if take == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
        idx = np.argpartition(-sims, take - 1)[:take]
        return pa.table(
            {
                id_col: pa.array(ids[idx]),
                "cosine": pa.array(sims[idx].astype(np.float64), type=pa.float64()),
            }
        )

    local = embeddings.select_columns([id_col, vec_col]).map_batches(
        topk_batch, batch_format="pyarrow"
    )
    df = local.to_pandas()
    df = df.sort_values(["cosine", id_col], ascending=[False, True], kind="mergesort")
    return df.head(k).reset_index(drop=True)


def embedding_neardup_bruteforce(
    embeddings: Dataset,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Exact all-pairs embedding-cosine near-dup pairs (a < b). The
    normalized matrix is broadcast once; the O(n^2) similarity matrix is
    row-partitioned across tasks (SQL-oracle-parity baseline; the
    bucketed variant above is the scale path)."""
    df = embeddings.select_columns([id_col, vec_col]).to_pandas()
    df = df.sort_values(id_col).reset_index(drop=True)
    ids = df[id_col].to_numpy().astype(np.int64)
    m = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in df[vec_col]]))
    m_ref = ray.put(m)
    ids_ref = ray.put(ids)
    n = len(ids)

    @ray.remote
    def block(lo: int, hi: int, thr: float):
        mm = ray.get(m_ref)
        ii = ray.get(ids_ref)
        sims = mm[lo:hi] @ mm.T
        rows = []
        for r in range(lo, hi):
            srow = sims[r - lo]
            cols = np.flatnonzero(srow[r + 1 :] >= thr) + r + 1
            for c in cols:
                rows.append((int(ii[r]), int(ii[c]), float(srow[c])))
        return rows

    step = max(16, n // 32)
    futs = [block.remote(lo, min(lo + step, n), threshold) for lo in range(0, n, step)]
    rows = [r for part in ray.get(futs) for r in part]
    out = pd.DataFrame(rows, columns=["a", "b", "cosine"]).astype(
        {"a": "int64", "b": "int64", "cosine": "float64"}
    )
    return out.sort_values(["a", "b"]).reset_index(drop=True)
