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
    """Exact Jaccard of two sorted unique arrays."""
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


def verify_pairs_small(
    pairs: Dataset,
    docs: Dataset,
    cfg: DedupConfig,
    pair_doc_ids: np.ndarray,
) -> Dataset:
    """Broadcast-side verification for small candidate sets: the
    candidate docs' TEXTS are semi-join-filtered from the docs table,
    ray.put once, and shingle sets are recomputed inside the verify
    tasks (cached per process) — shingle payloads are never
    materialized or shuffled. The exchange path below is the scale path.
    """
    import ray

    from raydedup.stages.signatures import shingle_hashes

    ids_ref = ray.put(np.sort(pair_doc_ids))

    def keep_candidates(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, wanted)))

    subset = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(keep_candidates, batch_format="pyarrow")
        .to_pandas()
    )
    text_map = dict(zip(subset["doc_id"].astype(int), subset["text"]))
    map_ref = ray.put(text_map)
    tau = cfg.jaccard_tau

    def verify_batch(t: pa.Table) -> pa.Table:
        tm = ray.get(map_ref)
        cache: dict[int, np.ndarray] = {}

        def sset(d: int) -> np.ndarray:
            s = cache.get(d)
            if s is None:
                s = cache[d] = shingle_hashes(tm[d], cfg)
            return s

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

    return pairs.select_columns(["a", "b"]).map_batches(
        verify_batch, batch_format="pyarrow"
    )


def verify_pairs_exchange(
    pairs: Dataset,
    docs: Dataset,
    cfg: DedupConfig,
    pair_doc_ids: np.ndarray,
    num_buckets: int | None = None,
) -> pa.Table:
    """Scale-path verification: two hash-exchange join rounds over the
    candidate docs' TEXT.

    Docs are semi-join-filtered to ids appearing in any pair (ids
    broadcast — ids only, not payloads), then co-partitioned with the
    pair table twice (on ``a``, then on ``b``); each bucket kernel
    recomputes the shingle sets for its local docs once and verifies its
    pairs. Shingle payloads are never materialized or shuffled — only
    raw text moves, exactly twice, for candidate docs only.
    """
    import ray

    from raydedup.stages.exchange import (
        default_buckets,
        reduce_join_split,
        split_dataset,
    )
    from raydedup.stages.signatures import shingle_hashes

    ids_ref = ray.put(np.sort(pair_doc_ids))

    def keep_candidates(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, wanted)))

    doc_subset = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(keep_candidates, batch_format="pyarrow")
        .materialize()
    )

    def attach_a(left: pa.Table, right: pa.Table) -> pa.Table:
        texts = dict(
            zip(right.column("doc_id").to_pylist(), right.column("text").to_pylist())
        )
        sets = {d: shingle_hashes(t, cfg) for d, t in texts.items()}
        a = left.column("a").to_pylist()
        return pa.table(
            {
                "a": left.column("a"),
                "b": left.column("b"),
                "shingles_a": pa.array(
                    [sets[x].tobytes() for x in a], type=pa.large_binary()
                ),
            }
        )

    tau = cfg.jaccard_tau

    def attach_b_and_verify(left: pa.Table, right: pa.Table) -> pa.Table:
        texts = dict(
            zip(right.column("doc_id").to_pylist(), right.column("text").to_pylist())
        )
        sets = {d: shingle_hashes(t, cfg) for d, t in texts.items()}
        b = left.column("b").to_pylist()
        sa = left.column("shingles_a").to_pylist()
        jac = np.empty(len(b), dtype=np.float64)
        for i in range(len(b)):
            jac[i] = jaccard_sorted(np.frombuffer(sa[i], dtype=np.uint64), sets[b[i]])
        keep = jac >= tau
        return pa.table(
            {
                "a": left.column("a"),
                "b": left.column("b"),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        ).filter(pa.array(keep))

    # The doc subset is split on doc_id ONCE and its bucket refs are
    # reused by both join rounds (keys "a" and "b" both address doc_id
    # buckets) — one split wave instead of two.
    if num_buckets is None:
        num_buckets = default_buckets()
    dsplit = split_dataset(doc_subset, "doc_id", num_buckets)
    psplit = split_dataset(pairs.select_columns(["a", "b"]), "a", num_buckets)
    r1 = reduce_join_split(psplit, dsplit, attach_a, num_buckets)
    r2split = split_dataset(r1, "b", num_buckets)
    r2 = reduce_join_split(r2split, dsplit, attach_b_and_verify, num_buckets)
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
