"""Global ranking without a global sort (row_number / ntile).

K3's result ranking (`OlafStrategy.java:543-557`) taken corpus-wide:
assign every row its EXACT global rank under (value ASC, id ASC) and an
``ntile`` bucket — without ever sorting the corpus on one node, the
operation `ds.sort()` would shuffle everything for.

Two passes:

1. distinct-value counts: per-batch `np.unique` combiner, ONE
   value-keyed exchange, O(distinct values) driver merge → a broadcast
   (sorted values, cumulative count strictly below each value) — the
   same shape `stages/quantiles.py` uses for exact percentiles.
2. rank assembly: ONE exchange keyed on the value column; a bucket
   holds every row of its values, sorts (value, id) once, and each
   row's rank = cum_below[value] + within-value position + 1. Ties are
   impossible (id is unique), so ranks are a permutation of 1..n.

``ntile`` = ``(k * (rank-1)) // n`` — pure integer arithmetic, equal in
numpy and DuckDB for the non-negative operands involved.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset

I64 = np.int64


def global_rank(
    ds: Dataset,
    value_col: str,
    id_col: str,
    ntile: int = 4,
) -> Dataset:
    """ds -> (id_col, value_col, rank, tile): dense 1-based global rank
    by (value ASC, id ASC) and the k-tile index in [0, ntile)."""
    proj = ds.select_columns([id_col, value_col])

    def vpartial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"v": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(I64)
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()), "c": pa.array(c.astype(I64), pa.int64())})

    def vreduce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"v": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        v = t.column("v").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(v, kind="stable")
        v, c = v[order], c[order]
        first = np.empty(v.shape[0], dtype=bool)
        first[0] = True
        first[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(first)
        return pa.table(
            {
                "v": pa.array(v[starts], pa.int64()),
                "c": pa.array(np.add.reduceat(c, starts).astype(I64), pa.int64()),
            }
        )

    from raydedup.stages.exchange import hash_exchange_apply

    counts = hash_exchange_apply(
        proj.map_batches(vpartial, batch_format="pyarrow"), "v", vreduce
    )
    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            (value_col, pa.int64()),
            ("rank", pa.int64()),
            ("tile", pa.int64()),
        ]
    )
    if counts.num_rows == 0:
        return rd.from_arrow(out_schema.empty_table())
    vs = counts.column("v").to_numpy(zero_copy_only=False).copy()
    cs = counts.column("c").to_numpy(zero_copy_only=False).copy()
    order = np.argsort(vs, kind="stable")
    vs, cs = vs[order], cs[order]
    cum_below = np.concatenate(([0], np.cumsum(cs)[:-1])).astype(I64)
    n_total = int(cs.sum())
    bc = ray.put((vs, cum_below))

    def rank_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        v = t.column(value_col).to_numpy(zero_copy_only=False).astype(I64)
        i = t.column(id_col).to_numpy(zero_copy_only=False).astype(I64)
        order = np.lexsort((i, v))
        v, i = v[order], i[order]
        first = np.empty(v.shape[0], dtype=bool)
        first[0] = True
        first[1:] = v[1:] != v[:-1]
        starts = np.flatnonzero(first)
        run_len = np.diff(starts, append=I64(v.shape[0]))
        within = np.arange(v.shape[0], dtype=I64) - np.repeat(starts, run_len)
        bvs, bcum = ray.get(bc)
        pos = np.searchsorted(bvs, v)
        rank = bcum[pos] + within + 1
        tile = (ntile * (rank - 1)) // n_total
        return pa.table(
            {
                id_col: pa.array(i, pa.int64()),
                value_col: pa.array(v, pa.int64()),
                "rank": pa.array(rank, pa.int64()),
                "tile": pa.array(tile, pa.int64()),
            }
        )

    def vprep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table().select([id_col, value_col])
        import pyarrow.compute as pc

        return pa.table(
            {
                id_col: pc.cast(t.column(id_col), pa.int64()),
                value_col: pc.cast(t.column(value_col), pa.int64()),
            }
        )

    refs = hash_exchange_apply(
        proj.map_batches(vprep, batch_format="pyarrow"),
        value_col,
        rank_bucket,
        collect=False,
    )
    from raydedup.stages.exchange import refs_to_dataset

    # empty buckets dropped remotely (row counts only on the driver)
    return refs_to_dataset(refs, out_schema)
