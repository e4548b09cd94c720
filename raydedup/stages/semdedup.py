"""SemDeDup — semantic deduplication over an embedding column.

The pipeline shape follows Abbas et al., "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication" (arXiv:2303.09540):
partition the embedding space into clusters, then within each cluster
drop every vector that has a near-identical neighbor (cosine >= tau).
Pairwise cosine is confined to clusters, so total work is
sum_c n_c^2 << n^2 and the vectors ship through exactly ONE exchange.

Cluster assignment here is the DETERMINISTIC sign-projection bucket —
the low ``n_bucket_bits`` bits of the 64-bit embedding SimHash sketch
(``stages/embsketch.py sketch_kernel``) — rather than fitted k-means:
random-hyperplane buckets are a locality clustering from the same LSH
family the paper's k-means approximates, they are oracle-exact (the SQL
mirror reproduces the identical assignment bit-for-bit, no iterative
fit to replay), and identical vectors land in the same bucket by
construction so exact semantic copies can never escape. The fitted
k-means path exists separately (``stages/ann.py`` kmeans/IVF) for the
approximate regime; near-copy recall of the bucketed rule vs the
global rule is gated in ``tests/test_semdedup.py``.

Keep rule (deterministic, min-id representative — the flagship
union-find convention): vectors in a bucket are scanned in ``vec_id``
order; a vector is PRUNED iff some EARLIER in-bucket vector is within
cosine >= tau, and ``dup_of`` records the smallest such earlier id
(-1 for kept rows). Reference analog: the per-resource duplicate check
that keeps the first-stored copy (``Panako store`` duplicate-resource
gate, `cli/Store.java` checksum short-circuit), lifted from byte
identity to the semantic-embedding modality.

Scale shape: sketch+bucket is a row-local ``map_batches`` (the +/-1
projection matrix is process-cached); ONE hash exchange on the bucket
id co-locates each cluster; in-bucket work is one normalized float64
matmul per cluster (vectorized run arithmetic over a bucket lexsort —
no per-row Python). At 10^12 rows ``n_bucket_bits`` grows so
max_c n_c stays a task-sized matmul; the exchange ships each vector
exactly once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from raydedup.stages.ann import _batch_matrix, _normalize
from raydedup.stages.embsketch import DEFAULT_SEED, sketch_kernel
from raydedup.stages.exchange import hash_exchange_apply

I64 = np.int64

_OUT_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("bucket", pa.int64()),
        ("keep", pa.int64()),
        ("dup_of", pa.int64()),
    ]
)


def _bucket_kernel(
    t: pa.Table, *, threshold: float, id_col: str, vec_col: str
) -> pa.Table:
    """One exchange bucket (possibly several sketch-buckets) -> per-vector
    (vec_id, bucket, keep, dup_of) rows. Groups by bucket via lexsort;
    each group is one normalized matmul + a masked column-min."""
    if t.num_rows == 0 or t.num_columns == 0:
        return _OUT_SCHEMA.empty_table()
    ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(I64)
    buck = t.column("bucket").to_numpy(zero_copy_only=False).astype(I64)
    m = _batch_matrix(t, vec_col)
    order = np.lexsort((ids, buck))
    ids, buck, m = ids[order], buck[order], m[order]
    n = ids.shape[0]
    starts = np.flatnonzero(np.r_[True, buck[1:] != buck[:-1]])
    ends = np.r_[starts[1:], n]
    keep = np.ones(n, dtype=I64)
    dup_of = np.full(n, -1, dtype=I64)
    for lo, hi in zip(starts, ends):
        g = hi - lo
        if g < 2:
            continue
        mn = _normalize(m[lo:hi])
        sims = mn @ mn.T
        # earlier = strictly-lower vec_id == strictly-lower row index
        # (rows are id-sorted within the bucket group); tril keeps only
        # j < i without materializing O(g^2) int64 index arrays
        hit = np.tril(sims >= threshold, k=-1)
        has = hit.any(axis=1)
        if not has.any():
            continue
        # smallest earlier id: first True column per row
        first = hit.argmax(axis=1)
        rows = np.flatnonzero(has)
        keep[lo + rows] = 0
        dup_of[lo + rows] = ids[lo + first[rows]]
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "bucket": pa.array(buck, pa.int64()),
            "keep": pa.array(keep, pa.int64()),
            "dup_of": pa.array(dup_of, pa.int64()),
        }
    )


def semdedup(
    embeddings: Dataset,
    *,
    threshold: float = 0.4,
    n_bucket_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = DEFAULT_SEED,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-vector SemDeDup verdicts as a DATASET of refs (never
    collected on the driver — the 10^12-row contract): columns
    (vec_id, bucket, keep, dup_of).

    ``n_bucket_bits=0`` degenerates to ONE global cluster — the exact
    (unbucketed) rule, used by tests as the recall baseline. All output
    columns are integers, so the result hash-matches the SQL mirror
    with no float-boundary hazard beyond the proven cosine predicate.
    On fully-empty input the blocks may carry no schema (the exchange
    empty-collect contract shared with ``stages/lm.py term_counts``).
    """
    if not 0 <= n_bucket_bits <= 32:
        raise ValueError(f"n_bucket_bits must be in [0, 32], got {n_bucket_bits}")
    mask = np.uint64((1 << n_bucket_bits) - 1)

    def bucketize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return pa.schema(
                [("bucket", pa.int64()), (id_col, pa.int64()),
                 (vec_col, pa.large_list(pa.float64()))]
            ).empty_table()
        sk = sketch_kernel(_batch_matrix(batch, vec_col), seed=seed)
        return pa.table(
            {
                "bucket": pa.array((sk & mask).astype(I64)),
                id_col: batch.column(id_col),
                vec_col: batch.column(vec_col),
            }
        )

    bucketed = embeddings.select_columns([id_col, vec_col]).map_batches(
        bucketize, batch_format="pyarrow"
    )
    refs = hash_exchange_apply(
        bucketed,
        "bucket",
        lambda t: _bucket_kernel(
            t, threshold=threshold, id_col=id_col, vec_col=vec_col
        ),
        num_buckets=num_buckets,
        collect=False,
    )
    import ray.data as rd

    return rd.from_arrow_refs(refs)
