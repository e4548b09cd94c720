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


def topk_boundary_mask(sims: np.ndarray, k: int, axis: int = 0) -> np.ndarray:
    """Boolean mask keeping every element that TIES OR BEATS the k-th
    largest along ``axis`` — the tie-safe local top-k cut. A bare
    argpartition keeps an arbitrary subset of boundary ties, so with
    exact-duplicate embeddings (the norm in a dedup corpus) the driver
    merge's documented (cosine DESC, id ASC) tie-break would act on a
    partition-layout-dependent candidate set (review finding). The mask
    admits k + boundary-tie elements; the driver merge applies the
    final deterministic order and head(k)."""
    n = sims.shape[axis]
    take = min(k, n)
    if take == 0:
        return np.zeros_like(sims, dtype=bool)
    kth = np.partition(sims, n - take, axis=axis).take(n - take, axis=axis)
    return sims >= (np.expand_dims(kth, axis) if sims.ndim == 2 else kth)


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
        idx = np.flatnonzero(topk_boundary_mask(sims, k))
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


def knn_cosine_batch(
    embeddings: Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Batch-of-queries exact top-k cosine: ONE broadcast (Q x dim)
    query matrix, one matmul per data batch against all queries, local
    per-query top-k inside the task, global per-query merge on the
    driver (merge input is Q*k rows per batch, never the dataset).
    Returns (query_id, vec_id, cosine, rank)."""
    q = np.asarray(queries, dtype=np.float64)
    if q.ndim == 1:
        q = q.reshape(1, -1)
    qn = _normalize(q)
    qids = (
        np.arange(qn.shape[0], dtype=np.int64)
        if query_ids is None
        else np.asarray(query_ids, dtype=np.int64)
    )
    q_ref = ray.put(qn)

    def topk_batch(batch: pa.Table) -> pa.Table:
        qq = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = qq @ m.T  # (Q, batch)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        rowq, cols = np.nonzero(topk_boundary_mask(sims, k, axis=1))
        return pa.table(
            {
                "qi": pa.array(rowq.astype(np.int64), type=pa.int64()),
                id_col: pa.array(ids[cols]),
                "cosine": pa.array(
                    sims[rowq, cols].astype(np.float64), type=pa.float64()
                ),
            }
        )

    local = embeddings.select_columns([id_col, vec_col]).map_batches(
        topk_batch, batch_format="pyarrow"
    )
    df = local.to_pandas()
    df = df.sort_values(
        ["qi", "cosine", id_col], ascending=[True, False, True], kind="mergesort"
    )
    df["rank"] = df.groupby("qi").cumcount() + 1
    df = df[df["rank"] <= k].reset_index(drop=True)
    df["query_id"] = qids[df["qi"].to_numpy()]
    return df[["query_id", id_col, "cosine", "rank"]]


def auto_centroids(n_rows: int) -> int:
    """Centroid count scaled to the data (~sqrt(n), the standard IVF
    sizing): 8 centroids on 500 testdata rows, ~10^6 on 10^12 vectors —
    never the fixed 8-centroid stratification the round-1 review flagged."""
    return int(min(65536, max(8, round(np.sqrt(max(n_rows, 1))))))


def train_centroids(
    embeddings: Dataset,
    n_centroids: int | None = None,
    rounds: int = 4,
    seed: int = 0x5EED_0C0C,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic DISTRIBUTED k-means: init from a hash-spread sample
    (k smallest mix64(vec_id) — uniform over the dataset regardless of
    partition layout, not the first parquet rows), then ``rounds`` full
    Lloyd passes where each map task emits per-centroid (sum, count)
    partials and the driver reduces the (n_centroids x dim) partials —
    centroids are the only state that ever reaches the driver."""
    from raydedup.hashing import mix64

    n_rows = embeddings.count()
    if n_centroids is None:
        n_centroids = auto_centroids(n_rows)
    n_centroids = min(n_centroids, max(n_rows, 1))
    sample_k = n_centroids

    def spread_sample(batch: pa.Table) -> pa.Table:
        # per-batch k-smallest-hash rows; driver merges k smallest overall
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = mix64(ids.astype(np.uint64) + np.uint64(seed))
        take = min(sample_k, h.shape[0])
        idx = np.argpartition(h, take - 1)[:take] if take < h.shape[0] else np.arange(h.shape[0])
        out = batch.take(pa.array(np.sort(idx)))
        return pa.table(
            {
                "h": pa.array(h[np.sort(idx)].view(np.int64), type=pa.int64()),
                vec_col: out.column(vec_col),
            }
        )

    samp = embeddings.select_columns([id_col, vec_col]).map_batches(
        spread_sample, batch_format="pyarrow"
    ).to_pandas()
    # sort by the UINT64 hash (the stored column is an int64 bit-view;
    # int64 order would make the selection depend on batch layout)
    hs = samp["h"].to_numpy().view(np.uint64)
    samp = samp.iloc[np.argsort(hs, kind="stable")].head(sample_k)
    cents = _normalize(
        np.stack([np.asarray(v, dtype=np.float64) for v in samp[vec_col]])
    )

    for _ in range(rounds):
        cents_ref = ray.put(cents)

        def partials(batch: pa.Table) -> pa.Table:
            c = ray.get(cents_ref)
            m = _normalize(_batch_matrix(batch, vec_col))
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=c.shape[0]).astype(np.int64)
            return pa.table(
                {
                    "cid": pa.array(np.arange(c.shape[0], dtype=np.int64)),
                    "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "cnt": pa.array(counts, type=pa.int64()),
                }
            )

        part = embeddings.select_columns([vec_col]).map_batches(
            partials, batch_format="pyarrow"
        ).to_pandas()
        k, d = cents.shape
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        cids = part["cid"].to_numpy().astype(np.int64)
        vstack = np.stack([np.asarray(v, dtype=np.float64) for v in part["vsum"]])
        np.add.at(sums, cids, vstack)
        np.add.at(counts, cids, part["cnt"].to_numpy().astype(np.int64))
        nonzero = counts > 0
        cents[nonzero] = sums[nonzero] / counts[nonzero, None]
        cents = _normalize(cents)
    return cents


def knn_cosine_ivf(
    embeddings: Dataset,
    query: np.ndarray,
    k: int = 10,
    n_centroids: int | None = None,
    n_probe: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """IVF approximate top-k: scan only the n_probe buckets whose
    centroids are closest to the query (bucket filter inside map_batches
    against broadcast centroids — no shuffle).

    ``n_probe=None`` probes every bucket: the standard nprobe=nlist
    property makes the result EXACT (equal to brute force) while still
    exercising the full IVF machinery — training, assignment, probe
    routing, per-bucket top-k, merge. The driver's oracle-checked query
    uses that config; approximate n_probe recall is gated in
    tests/test_ann.py."""
    cents = train_centroids(embeddings, n_centroids=n_centroids, vec_col=vec_col)
    if n_probe is None:
        n_probe = cents.shape[0]
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
        if sims.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
        idx = np.flatnonzero(topk_boundary_mask(sims, k))
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
    n_centroids: int | None = None,
    n_probe: int | None = 2,
    max_bucket: int = 8192,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Embedding-cosine near-dup pairs, bucketed (the scale path).

    Each vector is MULTI-PROBE assigned to its ``n_probe`` nearest
    centroids (a pair split across two neighbouring Voronoi cells is
    recovered when either vector probes the other's cell); all-pairs
    cosine runs inside each bucket and duplicated pairs are de-duped.
    Buckets larger than ``max_bucket`` (hot-key skew: near-constant
    embedding regions) are deterministically SUB-BUCKETED by a hash of
    the vec_id — within-sub pairs stay exact, cross-sub pairs of the
    degenerate bucket are dropped and COUNTED (``n_subbucketed``
    attribute on the returned frame), mirroring the LSH path's
    max_band_postings policy. n_centroids defaults to ~sqrt(n).

    ``n_probe=None`` assigns every vector to every bucket: every pair is
    co-bucketed, so the result is EXACT (equal to the brute-force
    all-pairs baseline) while exercising the full bucket/dedupe
    machinery — the driver's oracle-checked query uses that config;
    approximate n_probe recall is gated in tests/test_ann.py."""
    from raydedup.hashing import mix64

    cents = train_centroids(
        embeddings, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col
    )
    probe = cents.shape[0] if n_probe is None else min(n_probe, cents.shape[0])
    cents_ref = ray.put(cents)

    def bucketize(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ c.T
        # top-n_probe centroid ids per vector
        top = np.argpartition(-sims, probe - 1, axis=1)[:, :probe].astype(np.int64)
        n = m.shape[0]
        return pa.table(
            {
                "bucket": pa.array(top.ravel(), type=pa.int64()),
                id_col: pa.array(
                    np.repeat(
                        batch.column(id_col).to_numpy(zero_copy_only=False), probe
                    )
                ),
                vec_col: batch.column(vec_col).take(
                    pa.array(np.repeat(np.arange(n), probe))
                ),
            }
        )

    bucketed = embeddings.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pyarrow"
    )

    _SENTINEL = np.int64(np.iinfo(np.int64).min)
    _PAIR_SCHEMA = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("cosine", pa.float64())]
    )

    def pairs_kernel(t: pa.Table) -> pa.Table:
        """One exchange bucket (= several whole centroid buckets): the
        vector matrix is rebuilt ONCE zero-copy from the flattened list
        column, then each centroid bucket's pairwise cosine runs as a
        matmul over its row-slice — no per-row Python, no sort shuffle
        (this replaced groupby().map_groups(pandas), which paid Ray's
        comparison-sort exchange plus a per-row np.stack per group)."""
        if t.num_rows == 0 or t.num_columns == 0:
            return _PAIR_SCHEMA.empty_table()
        bk = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(bk, kind="stable")
        bk, ids = bk[order], ids[order]
        m = _normalize(_batch_matrix(t, vec_col))[order]
        nb = np.empty(bk.shape[0], dtype=bool)
        nb[0] = True
        nb[1:] = bk[1:] != bk[:-1]
        starts = np.flatnonzero(nb)
        sizes = np.diff(np.append(starts, bk.shape[0]))
        out_a, out_b, out_c = [], [], []
        n_subbed = 0
        for st, sz in zip(starts, sizes):
            rids = ids[st : st + sz]
            rm = m[st : st + sz]
            if sz > max_bucket:
                # degenerate hot bucket: deterministic sub-buckets,
                # exact within each; cross-sub pairs dropped + COUNTED
                n_sub = int(np.ceil(sz / max_bucket))
                sub = (mix64(rids.view(np.uint64)) % np.uint64(n_sub)).astype(np.int64)
                groups = [np.flatnonzero(sub == s) for s in range(n_sub)]
                n_subbed += 1
            else:
                groups = [np.arange(sz)]
            for gidx in groups:
                if gidx.shape[0] < 2:
                    continue
                gm = rm[gidx]
                gids = rids[gidx]
                sims = gm @ gm.T
                ii, jj = np.triu_indices(gidx.shape[0], k=1)
                keep = sims[ii, jj] >= threshold
                out_a.append(np.minimum(gids[ii[keep]], gids[jj[keep]]))
                out_b.append(np.maximum(gids[ii[keep]], gids[jj[keep]]))
                out_c.append(sims[ii[keep], jj[keep]].astype(np.float64))
        # in-band metrics row (a == int64 min can never be a real pair
        # key): b carries the sub-bucketed count for driver aggregation
        out_a.append(np.array([_SENTINEL]))
        out_b.append(np.array([n_subbed], dtype=np.int64))
        out_c.append(np.array([0.0]))
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a), type=pa.int64()),
                "b": pa.array(np.concatenate(out_b), type=pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )

    from raydedup.stages.exchange import hash_exchange_apply

    out_tbl = hash_exchange_apply(bucketed, "bucket", pairs_kernel)
    if out_tbl.num_rows == 0 or out_tbl.num_columns == 0:
        out_tbl = _PAIR_SCHEMA.empty_table()
    df = out_tbl.to_pandas()
    meta = df[df["a"] == _SENTINEL]
    n_subbucketed = int(meta["b"].sum()) if len(meta) else 0
    # multi-probe duplicates: the same (a, b) can be found in up to
    # n_probe shared buckets — keep one
    df = (
        df[df["a"] != _SENTINEL]
        .drop_duplicates(subset=["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    df.attrs["n_subbucketed"] = n_subbucketed
    return df


def knn_cosine_lsh(
    embeddings: Dataset,
    query: np.ndarray,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 0x5EED_11A5,
    probe_radius: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pd.DataFrame:
    """Random-hyperplane (sign) LSH top-k: vectors whose sign-pattern
    code is within Hamming distance ``probe_radius`` of the query's code
    in ANY of ``n_tables`` tables are scanned exactly. probe_radius=0 is
    classic single-bucket LSH; radius 1-2 is multi-probe (recovers
    near-boundary vectors without more tables); radius >= n_planes
    probes the whole Hamming ball, making the result EXACT — the
    driver's oracle-checked query uses that config, approximate-radius
    recall is gated in tests/test_ann.py. Alternative scale path to IVF
    (no training pass; buckets are data-independent)."""
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
        from raydedup.stages.signatures import hamming64

        pl = ray.get(planes_ref)
        qc = ray.get(qcodes_ref)
        q = ray.get(q_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        powers = 1 << np.arange(pl.shape[1], dtype=np.uint64)
        mask = np.zeros(m.shape[0], dtype=bool)
        for t in range(pl.shape[0]):
            codes = ((m @ pl[t].T) > 0).astype(np.uint64) @ powers
            if probe_radius <= 0:
                mask |= codes == qc[t]
            else:
                mask |= hamming64(codes, np.full_like(codes, qc[t])) <= probe_radius
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)[mask]
        sims = (m[mask] @ q.T).ravel()
        if sims.shape[0] == 0:
            return pa.table({id_col: pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())})
        idx = np.flatnonzero(topk_boundary_mask(sims, k))
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


def embedding_stats(embeddings: Dataset, col: str = "embedding") -> Dataset:
    """Per-vector sanity statistics: (vec_id, dim, l2_norm, mean_val).

    Stateless vectorized map_batches. Reductions use ``np.cumsum``
    (strictly sequential) rather than ``np.sum`` (pairwise): DuckDB's
    ``list_sum`` folds left-to-right, and only the sequential order is
    bit-identical to it — verified: cumsum matches list_sum exactly,
    np.sum differs by ~1e-15 (the repo's IEEE-parity discipline).
    """

    def kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema(
                [
                    ("vec_id", pa.int64()),
                    ("dim", pa.int64()),
                    ("l2_norm", pa.float64()),
                    ("mean_val", pa.float64()),
                ]
            ).empty_table()
        m = _batch_matrix(t, col)  # float64, one row per vector
        d = m.shape[1]
        if d == 0:
            # zero-length vectors: the degenerate case a sanity pass
            # must report, not crash on (cumsum[:, -1] needs width >= 1)
            zero = np.zeros(m.shape[0], dtype=np.float64)
            sq, sm = zero, zero
        else:
            sq = np.cumsum(m * m, axis=1)[:, -1]
            sm = np.cumsum(m, axis=1)[:, -1]
        return pa.table(
            {
                "vec_id": t.column("vec_id").cast(pa.int64()),
                "dim": pa.array(np.full(m.shape[0], d, dtype=np.int64), pa.int64()),
                "l2_norm": pa.array(np.sqrt(sq), pa.float64()),
                "mean_val": pa.array(sm / max(d, 1), pa.float64()),
            }
        )

    return embeddings.select_columns(["vec_id", col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def embedding_decontaminate(
    train: Dataset,
    eval_vectors: pd.DataFrame | pa.Table,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> Dataset:
    """Semantic decontamination: for every TRAIN vector, the most-similar
    EVAL vector (cosine argmax, ties to the smaller eval id) and a flag
    when that similarity reaches ``threshold``.

    The text analog lives in pipelines/decontaminate.py (k-gram
    broadcast); this is the same broadcast-small-side shape on the
    embedding column: the eval matrix is normalized once, shipped once
    via ``ray.put`` (read zero-copy by every task), and the train side
    streams through ONE map_batches — per-batch matmul, no shuffle, no
    pairwise blowup. At 10^12 train docs the cost is one pass; the eval
    side (benchmarks) is small by construction.

    Output: (vec_id, matched_eval_id, max_cosine, flagged) for every
    train row.
    """
    ev = (
        eval_vectors
        if isinstance(eval_vectors, pd.DataFrame)
        else eval_vectors.to_pandas()
    )
    ev = ev.sort_values(id_col).reset_index(drop=True)  # argmax tie -> smaller id
    if len(ev) == 0:
        raise ValueError(
            "embedding_decontaminate: empty eval set (nothing to score against)"
        )
    eids = ev[id_col].to_numpy().astype(np.int64)
    em = _normalize(np.stack([np.asarray(v, dtype=np.float64) for v in ev[vec_col]]))
    em_ref = ray.put(em)
    eids_ref = ray.put(eids)

    def score_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "matched_eval_id": pa.array([], pa.int64()),
                    "max_cosine": pa.array([], pa.float64()),
                    "flagged": pa.array([], pa.int64()),
                }
            )
        q = ray.get(em_ref)
        qi = ray.get(eids_ref)
        m = _normalize(_batch_matrix(batch, vec_col))
        sims = m @ q.T  # (rows x n_eval)
        best = np.argmax(sims, axis=1)  # first max == smallest eval id
        best_sim = sims[np.arange(sims.shape[0]), best]
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "matched_eval_id": pa.array(qi[best], pa.int64()),
                "max_cosine": pa.array(best_sim.astype(np.float64), pa.float64()),
                "flagged": pa.array(
                    (best_sim >= threshold).astype(np.int64), pa.int64()
                ),
            }
        )

    return train.select_columns([id_col, vec_col]).map_batches(
        score_batch, batch_format="pyarrow"
    )


def knn_classify(
    corpus: Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pd.DataFrame:
    """Majority-vote k-NN label prediction: exact top-k cosine neighbors
    per query (knn_cosine_batch's broadcast-matmul plan), then the most
    frequent neighbor label, ties to the SMALLEST label. Labels are
    fetched for the Q*k surviving neighbor ids only — the corpus label
    column never leaves its blocks. Returns (query_id, pred_label)."""
    nn = knn_cosine_batch(
        corpus, queries, query_ids, k=k, id_col=id_col, vec_col=vec_col
    )
    want = np.unique(nn[id_col].to_numpy())
    w_ref = ray.put(want)

    def lab(t: pa.Table) -> pa.Table:
        empty = pa.schema([(id_col, pa.int64()), (label_col, pa.int64())]).empty_table()
        if t.num_rows == 0 or t.num_columns == 0:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.isin(ids, ray.get(w_ref))
        t = t.filter(pa.array(keep))
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                label_col: t.column(label_col).cast(pa.int64()),
            }
        )

    lm = corpus.select_columns([id_col, label_col]).map_batches(
        lab, batch_format="pyarrow"
    ).to_pandas()
    nn = nn.merge(lm, on=id_col)
    votes = nn.groupby(["query_id", label_col]).size().reset_index(name="n")
    votes = votes.sort_values(
        ["query_id", "n", label_col], ascending=[True, False, True], kind="mergesort"
    )
    out = votes.groupby("query_id").head(1)[["query_id", label_col]]
    return (
        out.rename(columns={label_col: "pred_label"})
        .sort_values("query_id")
        .reset_index(drop=True)
    )
