"""Per-group top-k (the K3 result-truncation surface
(`OlafStrategy.java:543-557` sort-desc + limit) applied WITHIN each
group — the `row_number() OVER (PARTITION BY ...)` operator).

Scale shape: ONE hash exchange keyed on the group column, so group
cardinality never lands on the driver (a per-block-partials + driver
merge design is O(groups × blocks) driver memory; this is O(1)).
In-bucket: one lexsort by (group, -order_val, tie), per-group ranks by
run arithmetic, filter rank <= k — no per-group Python. Ordering is
(order_val DESC, tie ASC), deterministic including the k boundary.

Group keys are dictionary-encoded to int codes for the exchange and the
REAL string is carried alongside (hash collisions can only co-locate
two groups, never merge them — the lexsort separates by code, codes map
1:1 to strings per bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64


def group_topk(
    ds: Dataset,
    group_col: str,
    order_col: str,
    tie_col: str,
    k: int,
    columns: list[str] | None = None,
) -> Dataset:
    """ds -> rows ranked top-k per group by (order_col DESC, tie_col
    ASC), with a 1-based ``rank`` column appended. ``columns`` defaults
    to [group_col, order_col, tie_col]."""
    import pyarrow.compute as pc

    from raydedup.stages.exchange import (
        hash_exchange_apply,
        pa_schema_of,
        refs_to_dataset,
    )
    from raydedup.hashing import hash_strings_u64

    columns = columns or [group_col, order_col, tie_col]
    for c in (group_col, order_col, tie_col):
        if c not in columns:
            raise ValueError(f"columns must include {c}")
    out_schema = pa_schema_of(ds, columns).append(pa.field("rank", pa.int64()))

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"_gkey": pa.array([], pa.int64())})
        g = t.column(group_col)
        if pa.types.is_string(g.type) or pa.types.is_large_string(g.type):
            key = hash_strings_u64(
                g.to_pylist(), mixed=True
            ).view(I64)
        else:
            key = g.to_numpy(zero_copy_only=False).astype(I64)
        return t.select(columns).append_column("_gkey", pa.array(key, pa.int64()))

    prepped = ds.select_columns(columns).map_batches(prep, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        if t is None or t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        gk = t.column("_gkey").to_numpy(zero_copy_only=False)
        ov = t.column(order_col).to_numpy(zero_copy_only=False)
        tv = t.column(tie_col).to_numpy(zero_copy_only=False)
        # group identity = the real values, not the hash: order by the
        # group STRING within a hash-key run so two colliding groups
        # still rank independently
        gs = t.column(group_col)
        if pa.types.is_string(gs.type) or pa.types.is_large_string(gs.type):
            codes = pc.dictionary_encode(
                gs.combine_chunks() if isinstance(gs, pa.ChunkedArray) else gs
            )
            # any injective per-bucket mapping works (groups only need
            # to be contiguous after the sort, their mutual order is
            # irrelevant) — dictionary codes are exactly that
            gid = codes.indices.to_numpy(zero_copy_only=False).astype(I64)
        else:
            gid = gk
        order = np.lexsort((tv, -ov, gid))
        gid_s = gid[order]
        first = np.empty(gid_s.shape[0], dtype=bool)
        first[0] = True
        first[1:] = gid_s[1:] != gid_s[:-1]
        starts = np.flatnonzero(first)
        run_len = np.diff(starts, append=I64(gid_s.shape[0]))
        rank = np.arange(gid_s.shape[0], dtype=I64) - np.repeat(starts, run_len) + 1
        keep = rank <= k
        out = t.select(columns).take(pa.array(order[keep]))
        return out.append_column("rank", pa.array(rank[keep], pa.int64()))

    refs = hash_exchange_apply(prepped, "_gkey", bucket, collect=False)
    # empty buckets dropped remotely — group cardinality stays off the
    # driver (only per-bucket row counts cross the wire)
    return refs_to_dataset(refs, out_schema)
