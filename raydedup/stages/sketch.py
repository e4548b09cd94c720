"""KMV (k-minimum-values) distinct-count sketch per group.

The storage-statistics surface (A6, ``cli/Stats.java``) extended with
the sketch a 10^12-doc pipeline actually needs: exact per-group
COUNT(DISTINCT) requires shuffling every (group, value) pair, while the
KMV sketch ships at most k 8-byte hashes per group per batch — the
combiner output is bounded by k * |groups in batch| regardless of row
count, and merging two sketches (union the hash sets, keep the k
smallest) is associative, so partial-then-final reduction is exact.

Estimator (Bar-Yossef et al. 2002, "Counting distinct elements in a
data stream"): with h_k the k-th smallest of the value hashes mapped
uniformly onto [0, 2^64), est = (k-1) * 2^64 / h_k; when a group tracks
fewer than k distinct hashes the sketch IS the exact distinct count.
The whole reduction is integer-exact (u64 hashes, u64 compares); the
single final IEEE division is written in the same textual order as the
SQL mirror, so results are bit-reproducible against DuckDB.

Hash-collision caveat (shared with the mirror by construction): two
values colliding in mix64/FNV space count once — at 64 bits that is
negligible and DETERMINISTIC, not run-dependent.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64
U64 = np.uint64
_TWO64 = 18446744073709551616.0  # 2^64, exact in float64


def _value_hash(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    from raydedup.hashing import hash_strings_u64, mix64

    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash_strings_u64(col.to_pylist(), mixed=True)
    return mix64(col.to_numpy(zero_copy_only=False).astype(I64).view(U64))


def _kmin_per_group(t: pa.Table, group_col: str, k: int) -> pa.Table:
    """(group, h) rows -> at most k smallest DISTINCT h per group.
    One lexsort + run arithmetic; group identity is the real value
    (dictionary codes), not a hash of it."""
    import pyarrow.compute as pc

    gs = t.column(group_col)
    if pa.types.is_string(gs.type) or pa.types.is_large_string(gs.type):
        codes = pc.dictionary_encode(
            gs.combine_chunks() if isinstance(gs, pa.ChunkedArray) else gs
        )
        gid = codes.indices.to_numpy(zero_copy_only=False).astype(I64)
    else:
        gid = gs.to_numpy(zero_copy_only=False).astype(I64)
    h = t.column("_vh").to_numpy(zero_copy_only=False).view(U64)
    order = np.lexsort((h, gid))
    gid_s, h_s = gid[order], h[order]
    # drop duplicate (group, hash) rows, then rank within group runs
    keep_uniq = np.empty(gid_s.shape[0], dtype=bool)
    if keep_uniq.shape[0]:
        keep_uniq[0] = True
        keep_uniq[1:] = (gid_s[1:] != gid_s[:-1]) | (h_s[1:] != h_s[:-1])
    order, gid_s, h_s = order[keep_uniq], gid_s[keep_uniq], h_s[keep_uniq]
    first = np.empty(gid_s.shape[0], dtype=bool)
    if first.shape[0]:
        first[0] = True
        first[1:] = gid_s[1:] != gid_s[:-1]
    starts = np.flatnonzero(first)
    run_len = np.diff(starts, append=I64(gid_s.shape[0]))
    rank = np.arange(gid_s.shape[0], dtype=I64) - np.repeat(starts, run_len)
    sel = rank < k
    return t.select([group_col, "_vh"]).take(pa.array(order[sel]))


def kmv_distinct(
    ds: Dataset, group_col: str, value_col: str, k: int = 64
) -> Dataset:
    """ds -> one row per group: (group_col, n_tracked, est_distinct).

    n_tracked = min(k, true distinct hash count); est_distinct = exact
    n_tracked when below k, else (k-1) * 2^64 / h_k (float64, single
    division)."""
    if k < 2:
        raise ValueError("k must be >= 2 (h_k = 0 is unreachable then)")
    from raydedup.hashing import hash_strings_u64
    from raydedup.stages.exchange import (
        hash_exchange_apply,
        pa_schema_of,
        refs_to_dataset,
    )

    gtype = pa_schema_of(ds, [group_col]).field(group_col).type
    out_schema = pa.schema(
        [
            (group_col, gtype),
            ("n_tracked", pa.int64()),
            ("est_distinct", pa.float64()),
        ]
    )

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table(
                {
                    group_col: pa.array([], gtype),
                    "_vh": pa.array([], pa.uint64()),
                    "_gkey": pa.array([], pa.int64()),
                }
            )
        vh = _value_hash(t.column(value_col))
        t = pa.table(
            {group_col: t.column(group_col), "_vh": pa.array(vh, pa.uint64())}
        )
        t = _kmin_per_group(t, group_col, k)
        gs = t.column(group_col)
        if pa.types.is_string(gs.type) or pa.types.is_large_string(gs.type):
            key = hash_strings_u64(gs.to_pylist(), mixed=True).view(I64)
        else:
            key = gs.to_numpy(zero_copy_only=False).astype(I64)
        return t.append_column("_gkey", pa.array(key, pa.int64()))

    prepped = ds.select_columns([group_col, value_col]).map_batches(
        combine, batch_format="pyarrow"
    )

    def bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t is None or t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        t = _kmin_per_group(t, group_col, k)
        gs = t.column(group_col)
        if pa.types.is_string(gs.type) or pa.types.is_large_string(gs.type):
            codes = pc.dictionary_encode(
                gs.combine_chunks() if isinstance(gs, pa.ChunkedArray) else gs
            )
            gid = codes.indices.to_numpy(zero_copy_only=False).astype(I64)
        else:
            gid = gs.to_numpy(zero_copy_only=False).astype(I64)
        h = t.column("_vh").to_numpy(zero_copy_only=False).view(U64)
        order = np.lexsort((h, gid))
        gid_s, h_s = gid[order], h[order]
        first = np.empty(gid_s.shape[0], dtype=bool)
        first[0] = True
        first[1:] = gid_s[1:] != gid_s[:-1]
        starts = np.flatnonzero(first)
        n = np.diff(starts, append=I64(gid_s.shape[0]))
        h_last = h_s[starts + n - 1]
        # exact below k; KMV estimate at k — the division is the ONLY
        # float op, same textual order as the SQL mirror
        est = np.where(
            n < k,
            n.astype(np.float64),
            (float(k - 1) * _TWO64) / h_last.astype(np.float64),
        )
        return pa.table(
            {
                group_col: t.column(group_col).take(pa.array(order[starts])),
                "n_tracked": pa.array(np.minimum(n, k), pa.int64()),
                "est_distinct": pa.array(est, pa.float64()),
            }
        )

    refs = hash_exchange_apply(prepped, "_gkey", bucket, collect=False)
    return refs_to_dataset(refs, out_schema)
