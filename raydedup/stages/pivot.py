"""Pivot (long → wide): per-group counts of a categorical column as
columns (the `user × event_type` activity matrix — A6's storage
statistics (`PanakoStorageKV.java:381-467`) turned into the classic
reshape a feature-engineering pipeline feeds downstream).

Scale shape: per-batch combiner first — each batch collapses to one
wide partial row per (group) via a single lexsort — then ONE hash
exchange keyed on the group column sums the partials (group cardinality
never reaches the driver). Values outside the fixed category list fall
into ``n_other``; column order is the caller's list, deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64


def pivot_counts(
    ds: Dataset,
    group_col: str,
    pivot_col: str,
    categories: list[str],
) -> Dataset:
    """ds -> one row per group: (group_col, n_<cat>..., n_other,
    n_total). Counts per category of ``pivot_col``."""
    import pyarrow.compute as pc

    if not categories or len(set(categories)) != len(categories):
        raise ValueError("categories must be a non-empty unique list")
    cat_cols = [f"n_{c}" for c in categories]
    out_schema = pa.schema(
        [(group_col, pa.int64())]
        + [(c, pa.int64()) for c in cat_cols]
        + [("n_other", pa.int64()), ("n_total", pa.int64())]
    )

    def wide_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        g = t.column(group_col).to_numpy(zero_copy_only=False).astype(I64)
        pv = t.column(pivot_col)
        # category index per row: position in `categories`, -1 -> other
        cidx = np.full(t.num_rows, len(categories), dtype=I64)
        for j, c in enumerate(categories):
            m = pc.equal(pv, c).to_numpy(zero_copy_only=False)
            cidx[m] = j
        order = np.argsort(g, kind="stable")
        gs, cs = g[order], cidx[order]
        first = np.empty(gs.shape[0], dtype=bool)
        first[0] = True
        first[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(first)
        n_groups = starts.shape[0]
        row_of = np.cumsum(first) - 1
        mat = np.zeros((n_groups, len(categories) + 1), dtype=I64)
        np.add.at(mat, (row_of, cs), 1)
        cols = {group_col: pa.array(gs[starts], pa.int64())}
        for j, c in enumerate(cat_cols):
            cols[c] = pa.array(mat[:, j], pa.int64())
        cols["n_other"] = pa.array(mat[:, len(categories)], pa.int64())
        cols["n_total"] = pa.array(mat.sum(axis=1), pa.int64())
        return pa.table(cols)

    prepped = ds.select_columns([group_col, pivot_col]).map_batches(
        wide_partial, batch_format="pyarrow"
    )

    def sum_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        order = np.argsort(g, kind="stable")
        gs = g[order]
        first = np.empty(gs.shape[0], dtype=bool)
        first[0] = True
        first[1:] = gs[1:] != gs[:-1]
        starts = np.flatnonzero(first)
        cols = {group_col: pa.array(gs[starts], pa.int64())}
        for c in cat_cols + ["n_other", "n_total"]:
            v = t.column(c).to_numpy(zero_copy_only=False)[order]
            cols[c] = pa.array(np.add.reduceat(v, starts).astype(I64), pa.int64())
        return pa.table(cols)

    from raydedup.stages.exchange import hash_exchange_apply, refs_to_dataset

    refs = hash_exchange_apply(prepped, group_col, sum_bucket, collect=False)
    # empty buckets dropped remotely: group cardinality never reaches
    # the driver (only a row count per bucket does)
    return refs_to_dataset(refs, out_schema)
