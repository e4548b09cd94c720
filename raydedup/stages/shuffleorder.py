"""Deterministic global shuffle order: the training-export layout pass.

A training run wants the curated corpus in a reproducible pseudo-random
order (so epoch 1 on any cluster size reads the same sequence), sharded
into contiguous output files. `ds.random_shuffle()` is an all-to-all
exchange of every BYTE of every block and is seed-stable only within
one execution plan; this operator instead assigns each doc an explicit
shuffle POSITION — `pos = rank of mix64(doc_id ^ seed)` — so the heavy
payload never moves for the ordering decision, and any downstream
writer can lay rows out by `(shard, pos)` (e.g. `stages/export.py`).

mix64 (splitmix64 finalizer) is a bijection on u64, so keys are unique
and `pos` is an exact permutation of [0, n) — no ties, identical on
every run / block layout / cluster size (the same partition-invariance
argument as `stages/sampling.py`).

Rank WITHOUT a global sort, and without `stages/ranking.py`'s
O(distinct values) driver merge (every key is distinct here, so that
merge would be O(n) on the driver — wrong at 10^12 docs). mix64 keys
are uniform on u64, which makes an exact radix rank cheap:

1. histogram pass (combiner exchange): per-batch counts of the top
   RADIX_BITS key bits, ONE tiny keyed exchange sums them; the driver
   sees at most 2^RADIX_BITS rows and builds the exclusive
   cumulative-below array (0.5 MB at 16 bits — `ray.put` broadcast).
2. rank pass: ONE exchange keyed on the radix bucket; in-bucket
   lexsort by (bucket, key, doc_id) + run arithmetic gives local
   ranks; `pos = cum_below[bucket] + local_rank`. Only (doc_id, key)
   pairs move — never document payloads.

`shard = (n_shards * pos) // n` gives equal-size contiguous shards
(the exact integer k-tile both engines compute).

Reference analog: the reference randomizes work order only implicitly
via file-list iteration (`cli/Store.java:62-80`); an explicit
deterministic permutation is the scale-robust version of that.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from raydedup.hashing import mix64

I64 = np.int64
U64 = np.uint64

DEFAULT_SHUFFLE_SEED = 0x5EED_0007
RADIX_BITS = 16

_OUT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("pos", pa.int64()), ("shard", pa.int64())]
)
_KEY_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("skey", pa.int64()), ("rb", pa.int64())]
)


def _key_batch(t: pa.Table, seed: int) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        return _KEY_SCHEMA.empty_table()
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    k = mix64(ids.view(U64) ^ U64(seed))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "skey": pa.array(k.view(I64), pa.int64()),
            "rb": pa.array((k >> U64(64 - RADIX_BITS)).astype(I64), pa.int64()),
        }
    )


def _hist_partial(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        return pa.table({"rb": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
    rb = t.column("rb").to_numpy(zero_copy_only=False).astype(I64)
    u, c = np.unique(rb, return_counts=True)
    return pa.table(
        {"rb": pa.array(u, pa.int64()), "c": pa.array(c.astype(I64), pa.int64())}
    )


def _hist_reduce(t: pa.Table) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        return pa.table({"rb": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
    rb = t.column("rb").to_numpy(zero_copy_only=False).astype(I64)
    c = t.column("c").to_numpy(zero_copy_only=False).astype(I64)
    order = np.argsort(rb, kind="stable")
    rb, c = rb[order], c[order]
    first = np.empty(rb.shape[0], dtype=bool)
    first[0] = True
    first[1:] = rb[1:] != rb[:-1]
    starts = np.flatnonzero(first)
    sums = np.add.reduceat(c, starts)
    return pa.table(
        {"rb": pa.array(rb[starts], pa.int64()), "c": pa.array(sums, pa.int64())}
    )


def shuffle_positions(
    docs: Dataset,
    seed: int = DEFAULT_SHUFFLE_SEED,
    n_shards: int = 16,
) -> Dataset:
    """docs(doc_id, ...) -> (doc_id, pos, shard): pos is the 0-based
    rank of mix64(doc_id ^ seed) in signed-int64 order (an exact
    permutation of [0, n)); shard the contiguous n_shards-way split."""
    from raydedup.stages.exchange import hash_exchange_apply, refs_to_dataset

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    keyed = docs.select_columns(["doc_id"]).map_batches(
        lambda t: _key_batch(t, seed), batch_format="pyarrow"
    ).materialize()

    # pass 1: exact radix histogram (per-batch combiner, one tiny exchange)
    partials = keyed.map_batches(_hist_partial, batch_format="pyarrow")
    hist = hash_exchange_apply(partials, "rb", _hist_reduce)
    dense = np.zeros(1 << RADIX_BITS, dtype=np.int64)
    if hist.num_rows:
        dense[hist.column("rb").to_numpy(zero_copy_only=False).astype(I64)] = (
            hist.column("c").to_numpy(zero_copy_only=False).astype(I64)
        )
    n_total = int(dense.sum())
    if n_total == 0:
        import ray.data as rd

        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    # cumulative-below in SIGNED key order: signed-nonneg keys (top bit
    # 0 -> rb < 2^15) sort before signed-negative ones (rb >= 2^15)
    signed_order = np.concatenate(
        [
            np.arange(1 << (RADIX_BITS - 1), 1 << RADIX_BITS),
            np.arange(0, 1 << (RADIX_BITS - 1)),
        ]
    )
    # signed_order lists rbs from MOST NEGATIVE key upward
    cum_in_order = np.concatenate([[0], np.cumsum(dense[signed_order])[:-1]])
    cum_below = np.empty(1 << RADIX_BITS, dtype=np.int64)
    cum_below[signed_order] = cum_in_order
    cum_ref = ray.put(cum_below)

    # pass 2: one exchange keyed on the radix bucket; in-bucket ranks
    def rank_kernel(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _OUT_SCHEMA.empty_table()
        cum = ray.get(cum_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
        sk = t.column("skey").to_numpy(zero_copy_only=False).astype(I64)
        rb = t.column("rb").to_numpy(zero_copy_only=False).astype(I64)
        order = np.lexsort((ids, sk, rb))
        ids, sk, rb = ids[order], sk[order], rb[order]
        first = np.empty(rb.shape[0], dtype=bool)
        first[0] = True
        first[1:] = rb[1:] != rb[:-1]
        starts = np.flatnonzero(first)
        run_len = np.diff(starts, append=I64(rb.shape[0]))
        local = np.arange(rb.shape[0], dtype=I64) - np.repeat(starts, run_len)
        pos = cum[rb] + local
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
                "shard": pa.array((n_shards * pos) // n_total, pa.int64()),
            }
        )

    refs = hash_exchange_apply(keyed, "rb", rank_kernel, collect=False)
    return refs_to_dataset(refs, _OUT_SCHEMA)
