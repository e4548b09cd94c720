"""Cluster-assignment agreement: exact Rand-index components between
two clusterings of the same corpus.

The evaluation/ops tool a dedup owner runs after every config change
(tau, bands, shingle mode) or engine upgrade: of all C(n,2) doc pairs,
how many are co-clustered in A, in B, in both — and the Rand index
those imply. Reference analog: the reference validates strategy
changes by re-querying a stored corpus and comparing match sets
(``test/PanakoTest.java`` query-after-store assertions); this is that
comparison as a corpus-level operator.

Everything is exact integer pair counting — no sampling:

- ONE doc_id-keyed exchange joins the two assignments into (ca, cb)
  rows.
- ONE exchange keyed on ``ca``: every A-cluster lands whole in a
  bucket, and because (ca, cb) groups are subgroups of ca groups, the
  SAME bucket computes both `sum C(n_a,2)` and `sum C(n_ab,2)` — two
  int64 scalars per bucket.
- ONE exchange keyed on ``cb`` for `sum C(n_b,2)`.

The driver merges O(buckets) scalar partials; assignments are never
collected. Rand = (both + neither) / C(n,2) with neither derived by
inclusion-exclusion — ONE final IEEE division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64

_OUT_SCHEMA = pa.schema(
    [
        ("n_docs", pa.int64()),
        ("pairs_total", pa.int64()),
        ("pairs_same_a", pa.int64()),
        ("pairs_same_b", pa.int64()),
        ("pairs_same_both", pa.int64()),
        ("rand_index", pa.float64()),
    ]
)

_JOIN_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("ca", pa.int64()), ("cb", pa.int64())]
)


def _pairs_in_groups(keys: np.ndarray) -> int:
    """sum over groups of C(n,2), keys pre-sorted not required."""
    _, counts = np.unique(keys, return_counts=True)
    c = counts.astype(np.int64)
    return int((c * (c - 1) // 2).sum())


def _join_kernel(at: pa.Table, bt: pa.Table) -> pa.Table:
    if at.num_rows == 0 or at.num_columns == 0 or bt.num_rows == 0 or bt.num_columns == 0:
        return _JOIN_SCHEMA.empty_table()
    ai = at.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    ac = at.column("cluster_id").to_numpy(zero_copy_only=False).astype(I64)
    bi = bt.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    bc = bt.column("cluster_id").to_numpy(zero_copy_only=False).astype(I64)
    order = np.argsort(bi, kind="stable")
    bi, bc = bi[order], bc[order]
    pos = np.searchsorted(bi, ai)
    pos[pos == bi.shape[0]] = 0
    hit = bi[pos] == ai
    return pa.table(
        {
            "doc_id": pa.array(ai[hit], pa.int64()),
            "ca": pa.array(ac[hit], pa.int64()),
            "cb": pa.array(bc[pos[hit]], pa.int64()),
        }
    )


def _ca_counts(t: pa.Table) -> pa.Table:
    empty = pa.table(
        {
            "sa": pa.array([], pa.int64()),
            "sab": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )
    if t.num_rows == 0 or t.num_columns == 0:
        return empty
    ca = t.column("ca").to_numpy(zero_copy_only=False).astype(I64)
    cb = t.column("cb").to_numpy(zero_copy_only=False).astype(I64)
    # (ca, cb) pair groups via lexsort run arithmetic (exact, no hashing)
    order = np.lexsort((cb, ca))
    ca_s, cb_s = ca[order], cb[order]
    new_pair = np.empty(ca_s.shape[0], dtype=bool)
    new_pair[0] = True
    new_pair[1:] = (ca_s[1:] != ca_s[:-1]) | (cb_s[1:] != cb_s[:-1])
    starts = np.flatnonzero(new_pair)
    runs = np.diff(starts, append=I64(ca_s.shape[0])).astype(np.int64)
    sab = int((runs * (runs - 1) // 2).sum())
    return pa.table(
        {
            "sa": pa.array([_pairs_in_groups(ca)], pa.int64()),
            "sab": pa.array([sab], pa.int64()),
            "n": pa.array([ca.shape[0]], pa.int64()),
        }
    )


def _cb_counts(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        return pa.table({"sb": pa.array([], pa.int64())})
    cb = t.column("cb").to_numpy(zero_copy_only=False).astype(I64)
    return pa.table({"sb": pa.array([_pairs_in_groups(cb)], pa.int64())})


def assignment_agreement(a: Dataset, b: Dataset) -> pa.Table:
    """a, b: (doc_id, cluster_id) assignments of the same corpus ->
    one-row exact pair-agreement table + Rand index. Docs present in
    only one assignment are excluded (inner join semantics)."""
    from raydedup.stages.exchange import hash_exchange_apply, hash_exchange_join

    joined_refs = hash_exchange_join(
        a.select_columns(["doc_id", "cluster_id"]),
        b.select_columns(["doc_id", "cluster_id"]),
        "doc_id",
        "doc_id",
        _join_kernel,
    )
    # row counts ride the ca partials (one extra int64 per bucket) —
    # no separate counting task wave
    sa_t = hash_exchange_apply(joined_refs, "ca", _ca_counts)
    sb_t = hash_exchange_apply(joined_refs, "cb", _cb_counts)
    sa = int(pa.compute.sum(sa_t.column("sa")).as_py() or 0) if sa_t.num_rows else 0
    sab = int(pa.compute.sum(sa_t.column("sab")).as_py() or 0) if sa_t.num_rows else 0
    n_docs = int(pa.compute.sum(sa_t.column("n")).as_py() or 0) if sa_t.num_rows else 0
    sb = int(pa.compute.sum(sb_t.column("sb")).as_py() or 0) if sb_t.num_rows else 0
    total = n_docs * (n_docs - 1) // 2
    neither = total - sa - sb + sab
    rand = (sab + neither) / total if total else 1.0
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "pairs_total": pa.array([total], pa.int64()),
            "pairs_same_a": pa.array([sa], pa.int64()),
            "pairs_same_b": pa.array([sb], pa.int64()),
            "pairs_same_both": pa.array([sab], pa.int64()),
            "rand_index": pa.array([rand], pa.float64()),
        }
    ).cast(_OUT_SCHEMA)


def exact_clusters(docs: Dataset) -> Dataset:
    """Exact-duplicate-only assignment: cluster_id = min doc_id per
    byte-identical text (sha groups are disjoint — no union-find).
    The cheap B-side for `assignment_agreement` against the flagship."""
    from raydedup.pipelines.dedup import sha_key_table
    from raydedup.stages.exchange import hash_exchange_apply, refs_to_dataset

    schema = pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())])

    def kern(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
        digests = t.column("text_sha256").to_pylist()
        words = np.frombuffer(b"".join(digests), dtype=">i8").reshape(-1, 4)
        order = np.lexsort((ids, words[:, 3], words[:, 2], words[:, 1], words[:, 0]))
        w = words[order]
        ids_s = ids[order]
        new = np.empty(ids_s.shape[0], dtype=bool)
        new[0] = True
        new[1:] = (w[1:] != w[:-1]).any(axis=1)
        starts = np.flatnonzero(new)
        runs = np.diff(starts, append=I64(ids_s.shape[0]))
        roots = np.repeat(ids_s[starts], runs)  # group-min id: ids sorted last
        return pa.table(
            {
                "doc_id": pa.array(ids_s, pa.int64()),
                "cluster_id": pa.array(roots, pa.int64()),
            }
        )

    keyed = docs.map_batches(sha_key_table, batch_format="pyarrow")
    refs = hash_exchange_apply(keyed, "sha_key", kern, collect=False)
    return refs_to_dataset(refs, schema)
