"""Verification: candidate pairs -> verified pairs by exact Jaccard.

Transplant of Panako's per-candidate verification chain (min-support
filter -> sort hits -> head/tail mode-of-deltaT -> slope/inlier gates ->
coverage >= 0.2; ``OlafStrategy.java:331-453``). For text the "one
coherent alignment" check collapses to exact Jaccard between the two
docs' shingle sets with threshold tau, plus a SimHash Hamming
cross-check (the reference's histogram-fallback secondary matcher,
``OlafStrategy.java:462-541``).

The shingle-set join is a distributed hash join (``Dataset.join``,
hash-partitioned on doc_id): pairs are joined twice to attach each
side's sorted shingle hash set, then a vectorized-per-row kernel
computes |intersection| / |union| on the already-sorted uint64 arrays.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from raydedup.config import DedupConfig

I64 = np.int64


def jaccard_sorted(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique arrays.

    Measured (round 3): the per-PAIR numpy loop over this kernel beats
    every batch formulation tried at LSH-candidate shapes (5k pairs x
    150-600-element sets): a whole-batch (pid, value) lexsort +
    duplicate count ran 17x SLOWER (np.lexsort over 3.7M u64), a
    vectorized placement variant 4x slower, and a per-pair
    searchsorted-membership variant ~1.2x slower at both small and
    5k-element set sizes — np.intersect1d(assume_unique) is already a
    C-level concat+sort with tiny constants. Keep the loop: it is
    per-CANDIDATE (LSH-pruned), not per-row."""
    inter = np.intersect1d(a, b, assume_unique=True).shape[0]
    union = a.shape[0] + b.shape[0] - inter
    return inter / union if union else 1.0


def _jaccard_batch(batch: pa.Table, tau: float) -> pa.Table:
    n = batch.num_rows
    jac = np.empty(n, dtype=np.float64)
    la = batch.column("shingles_a").to_pylist()  # packed u64-LE bytes per doc
    lb = batch.column("shingles_b").to_pylist()
    for i in range(n):
        jac[i] = jaccard_sorted(
            np.frombuffer(la[i], dtype=np.uint64), np.frombuffer(lb[i], dtype=np.uint64)
        )
    keep = jac >= tau
    out = pa.table(
        {
            "a": batch.column("a"),
            "b": batch.column("b"),
            "jaccard": pa.array(jac, type=pa.float64()),
        }
    ).filter(pa.array(keep))
    return out


def _auto_partitions() -> int:
    """Join partition count sized to the cluster: each hash-join partition
    is an aggregating actor holding a CPU — more partitions than cores
    deadlocks a small cluster and over-fragments a big one."""
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(64, cpus // 2))


import ray as _ray


@_ray.remote
def _pack_shingle_broadcast(*tables: pa.Table):
    """Concat + doc_id-sort + flatten the candidate shingle blocks into
    the three flat numpy broadcast arrays (sorted ids, offsets, packed
    shingle data). Runs as a task so the bytes never visit the driver;
    plasma serves the numpy results zero-copy to every verify task."""
    nonempty = [t for t in tables if t.num_rows]
    if not nonempty:
        return (
            np.empty(0, dtype=np.int64),
            np.zeros(1, dtype=np.int64),
            np.empty(0, dtype=np.uint64),
        )
    subset = pa.concat_tables(nonempty)
    order = pa.compute.sort_indices(subset, sort_keys=[("doc_id", "ascending")])
    subset = subset.take(order).combine_chunks()
    ids_sorted = np.ascontiguousarray(
        subset.column("doc_id").to_numpy(zero_copy_only=False)
    )
    lens = subset.column("n").to_numpy(zero_copy_only=False)
    sh_col = subset.column("shingles")
    if isinstance(sh_col, pa.ChunkedArray):
        sh_col = sh_col.combine_chunks()
    flat_all = sh_col.flatten().to_numpy(zero_copy_only=False).view(np.uint64)
    offs = np.zeros(lens.shape[0] + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return ids_sorted, offs, np.ascontiguousarray(flat_all)


def verify_pairs_small(
    pairs: Dataset,
    docs: Dataset,
    cfg: DedupConfig,
    pair_doc_ids: np.ndarray,
) -> Dataset:
    """Broadcast-side verification: the candidate docs' TEXTS are
    semi-join-filtered from the docs table and broadcast ONCE as three
    flat numpy arrays (sorted ids, utf8 offsets, utf8 bytes) — plasma
    serves numpy buffers zero-copy, so every verify task reads the
    shared broadcast without per-task deserialization (a dict broadcast
    re-pickles per task). Shingle sets are recomputed inside the verify
    tasks (cached per batch); shingle payloads are never materialized or
    shuffled. The exchange path below is the 10^12-doc scale path —
    broadcast bytes are copied once per NODE on a real cluster, so the
    switch threshold (cfg.verify_broadcast_max_docs) bounds that copy.
    """
    import ray

    from raydedup.stages.signatures import batch_shingle_sets

    ids_ref = ray.put(np.sort(pair_doc_ids))

    def shingle_candidates(t: pa.Table) -> pa.Table:
        # semi-join filter + per-doc shingle-set computation, PARALLEL in
        # the map stage — verify tasks then do pure set intersection
        wanted = ray.get(ids_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(np.isin(ids, wanted)))
        sets = batch_shingle_sets(
            t.column("text").combine_chunks()
            if isinstance(t.column("text"), pa.ChunkedArray)
            else t.column("text"),
            cfg,
        )
        lens = np.fromiter((s.shape[0] for s in sets), dtype=np.int64, count=len(sets))
        flat = np.concatenate(sets) if sets else np.empty(0, dtype=np.uint64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n": pa.array(lens, type=pa.int64()),
                "shingles": pa.LargeListArray.from_arrays(
                    np.concatenate([[0], np.cumsum(lens)]).astype(np.int64),
                    pa.array(flat.view(np.int64), type=pa.int64()),
                ),
            }
        )

    # pack (concat + sort + flatten) in ONE remote task: the driver holds
    # only the three ObjectRefs — collecting ~|candidate docs| x |shingle
    # set| bytes to the driver and re-putting them was a fixed driver
    # cost (~seconds at 500k docs) that does not shrink with cluster size
    shingle_blocks = list(
        docs.select_columns(["doc_id", "text"])
        .map_batches(shingle_candidates, batch_format="pyarrow")
        .to_arrow_refs()
    )
    bids_ref, offs_ref, data_ref = _pack_shingle_broadcast.options(
        num_returns=3
    ).remote(*shingle_blocks)
    tau = cfg.jaccard_tau

    def verify_batch(t: pa.Table) -> pa.Table:
        bids = ray.get(bids_ref)
        boffs = ray.get(offs_ref)
        bdata = ray.get(data_ref)

        def sset(d: int) -> np.ndarray:
            i = int(np.searchsorted(bids, d))
            return bdata[boffs[i] : boffs[i + 1]]

        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        jac = np.empty(a.shape[0], dtype=np.float64)
        for i in range(a.shape[0]):
            jac[i] = jaccard_sorted(sset(int(a[i])), sset(int(b[i])))
        keep = jac >= tau
        return pa.table(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        ).filter(pa.array(keep))

    # candidates arrive as one driver-built block (from_arrow): split so
    # verification parallelizes across the pool
    work = pairs.select_columns(["a", "b"])
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    n_rows = work.count()
    target = int(min(2 * cpus, max(1, n_rows // 256)))
    if target > 1:
        work = work.repartition(target)
    return work.map_batches(verify_batch, batch_format="pyarrow")


def packed_shingle_table(docs_tbl: pa.Table, cfg: DedupConfig) -> pa.Table:
    """(doc_id, text) bucket -> (doc_id, shingles) where ``shingles`` is
    the doc's sorted unique shingle-hash set packed as little-endian
    uint64 bytes, computed with the VECTORIZED batch front half (Arrow
    split + dictionary hash + one global rolling pass) — never per-doc
    Python tokenization."""
    from raydedup.stages.signatures import batch_shingle_sets

    if docs_tbl.num_rows == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "shingles": pa.array([], pa.large_binary())}
        )
    col = docs_tbl.column("text")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    sets = batch_shingle_sets(arr, cfg)
    return pa.table(
        {
            "doc_id": docs_tbl.column("doc_id").cast(pa.int64()),
            "shingles": pa.array([s.tobytes() for s in sets], type=pa.large_binary()),
        }
    )


def lookup_packed(packed: pa.Table, keys: np.ndarray) -> tuple[pa.Array, np.ndarray]:
    """Gather ``packed.shingles`` rows by doc_id via sort + searchsorted.
    Returns (values, found_mask): a key absent from the bucket gets an
    arbitrary row and ``found[i] = False`` — callers DROP those pairs
    (a doc excluded from the shingle demand, e.g. an exact-dup member
    whose pairs are mirrored by its representative's)."""
    ids = packed.column("doc_id").to_numpy(zero_copy_only=False)
    if ids.shape[0] == 0:
        return (
            pa.array([b""] * keys.shape[0], type=pa.large_binary()),
            np.zeros(keys.shape[0], dtype=bool),
        )
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    pos = np.clip(np.searchsorted(sorted_ids, keys), 0, ids.shape[0] - 1)
    found = sorted_ids[pos] == keys
    col = packed.column("shingles")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.take(pa.array(order[pos].astype(np.int64))), found


def _jaccard_packed(sa: list, sb: list, tau: float) -> np.ndarray:
    jac = np.empty(len(sa), dtype=np.float64)
    for i in range(len(sa)):
        jac[i] = jaccard_sorted(
            np.frombuffer(sa[i], dtype=np.uint64), np.frombuffer(sb[i], dtype=np.uint64)
        )
    return jac


def make_attach_a():
    """Bucket kernel: pairs(a, b, ...) x packed(doc_id, shingles) ->
    (a, b, shingles_a) via vectorized gather."""

    def attach_a(left: pa.Table, right: pa.Table) -> pa.Table:
        if left.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "shingles_a": pa.array([], pa.large_binary())}
            )
        a = left.column("a").to_numpy(zero_copy_only=False)
        sha, found = lookup_packed(right, a)
        out = pa.table(
            {
                "a": left.column("a"),
                "b": left.column("b"),
                "shingles_a": sha,
            }
        )
        return out if found.all() else out.filter(pa.array(found))

    return attach_a


def make_attach_b_verify(tau: float):
    """Bucket kernel: (a, b, shingles_a) x packed(doc_id, shingles) ->
    verified (a, b, jaccard >= tau)."""

    def attach_b_and_verify(left: pa.Table, right: pa.Table) -> pa.Table:
        if left.num_rows == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        b = left.column("b").to_numpy(zero_copy_only=False)
        shb, found = lookup_packed(right, b)
        if not found.all():
            left = left.filter(pa.array(found))
            shb = shb.filter(pa.array(found))
            if left.num_rows == 0:
                return pa.table(
                    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                     "jaccard": pa.array([], pa.float64())}
                )
        jac = _jaccard_packed(
            left.column("shingles_a").to_pylist(), shb.to_pylist(), tau
        )
        return pa.table(
            {
                "a": left.column("a"),
                "b": left.column("b"),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        ).filter(pa.array(jac >= tau))

    return attach_b_and_verify


def verify_pairs_exchange(
    pairs: Dataset,
    docs: Dataset,
    cfg: DedupConfig,
    pair_doc_ids: np.ndarray,
    num_buckets: int | None = None,
) -> pa.Table:
    """Scale-path verification: two hash-exchange join rounds over the
    candidate docs' packed shingle sets.

    Docs are semi-join-filtered to ids appearing in any pair (ids
    broadcast — ids only, not payloads) and their shingle sets computed
    ONCE with the vectorized batch kernel during the filter map; the
    packed sets are split on doc_id once and the bucket refs reused by
    both join rounds (keys ``a`` and ``b`` both address doc_id buckets).
    Raw text never enters an exchange; per-pair work is a searchsorted
    gather plus one sorted-set intersection."""
    import ray

    from raydedup.stages.exchange import (
        default_buckets,
        reduce_join_resplit,
        reduce_join_split,
        split_dataset,
    )

    ids_ref = ray.put(np.sort(pair_doc_ids))

    def keep_and_shingle(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return packed_shingle_table(t.filter(pa.array(np.isin(ids, wanted))), cfg)

    doc_packed = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(keep_and_shingle, batch_format="pyarrow")
        .materialize()
    )

    if num_buckets is None:
        num_buckets = default_buckets()
    dsplit = split_dataset(doc_packed, "doc_id", num_buckets)
    psplit = split_dataset(pairs.select_columns(["a", "b"]), "a", num_buckets)
    # round 1's reduce tasks re-split their output on ``b`` in-task
    # (fused), so round 2 consumes the pieces without a split wave
    r1 = reduce_join_resplit(
        psplit, dsplit, make_attach_a(), "b", num_buckets, num_buckets
    )
    r2 = reduce_join_split(
        r1, dsplit, make_attach_b_verify(cfg.jaccard_tau), num_buckets
    )
    parts = [t for t in ray.get(r2) if t.num_rows]
    if not parts:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    return pa.concat_tables(parts)


def verify_pairs(
    pairs: Dataset,
    signatures: Dataset,
    cfg: DedupConfig,
    num_partitions: int | None = None,
) -> Dataset:
    """pairs(a, b[, n_collisions]) x signatures(doc_id, shingles)
    -> verified (a, b, jaccard >= tau).

    Distributed: two hash-partitioned joins on doc_id then a stateless
    per-batch Jaccard kernel. At 10^12-doc scale the pair table is the
    small side post-LSH; num_partitions bounds per-partition memory.
    The intermediate (pairs + side-a shingles) is materialized so the
    two joins' actor pools never run concurrently (deadlock-safe on
    small CPU counts).
    """
    if num_partitions is None:
        num_partitions = _auto_partitions()
    sh = signatures.select_columns(["doc_id", "shingles"])
    j1 = pairs.select_columns(["a", "b"]).join(
        sh,
        join_type="inner",
        num_partitions=num_partitions,
        on=("a",),
        right_on=("doc_id",),
        right_suffix="_a",
    )
    # after first join the shingles column belongs to side a
    j1 = j1.map_batches(
        lambda t: t.rename_columns(
            ["shingles_a" if c == "shingles" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    ).materialize()
    j2 = j1.join(
        sh,
        join_type="inner",
        num_partitions=num_partitions,
        on=("b",),
        right_on=("doc_id",),
        right_suffix="_b",
    )
    j2 = j2.map_batches(
        lambda t: t.rename_columns(
            ["shingles_b" if c == "shingles" else c for c in t.column_names]
        ),
        batch_format="pyarrow",
    )
    tau = cfg.jaccard_tau
    return j2.map_batches(
        lambda t: _jaccard_batch(t, tau), batch_format="pyarrow"
    )


def verify_pairs_broadcast(
    pairs_df: pd.DataFrame, shingle_map: dict[int, np.ndarray], tau: float
) -> pd.DataFrame:
    """Driver/broadcast verification for small candidate sets (tests, the
    ``same a b`` pair-check verb — ``cli/Same.java:50-85`` analog)."""
    jac = np.empty(len(pairs_df), dtype=np.float64)
    a_ids = pairs_df["a"].to_numpy()
    b_ids = pairs_df["b"].to_numpy()
    for i in range(len(pairs_df)):
        jac[i] = jaccard_sorted(shingle_map[int(a_ids[i])], shingle_map[int(b_ids[i])])
    out = pairs_df[["a", "b"]].copy()
    out["jaccard"] = jac
    return out[out["jaccard"] >= tau].reset_index(drop=True)
