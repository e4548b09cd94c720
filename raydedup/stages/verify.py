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
