"""Distributed anti-join / semi-join on int64 keys (big ⋈ big).

The reference's membership joins — `hasResource` skip-if-present
(`cli/Store.java:119-127`) and the `avoid`-set anti-semi-join
(`PanakoStorageKV.java:329,343,361`) — generalized to the relational
primitive over two Datasets: keep the left rows whose key does / does
not appear on the right. Neither side broadcasts: one two-sided hash
exchange on the key (`hash_exchange_join`), and in-bucket the right
side collapses to a sorted-unique key array probed with searchsorted —
per-bucket memory is O(|right bucket keys| + |left bucket|).

Output preserves the left rows (selected columns) untouched, so any
column type passes through hash-safe; returned as a Dataset (one block
per bucket) to stream at scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64


def key_join_filter(
    left: Dataset,
    right: Dataset,
    left_key: str,
    right_key: str,
    columns: list[str],
    anti: bool = True,
) -> Dataset:
    """left rows (projected to ``columns``) whose ``left_key`` is
    absent from (anti=True) / present in (anti=False, semi-join) the
    right side's ``right_key`` values."""
    import pyarrow.compute as pc

    if left_key not in columns:
        raise ValueError("columns must include left_key (the exchange key)")

    from raydedup.stages.exchange import pa_schema_of, refs_to_dataset

    lproj = left.select_columns(columns)
    # typed schema of the projection, resolved up-front so a fully-empty
    # left side still yields an empty result with the FULL projected
    # schema (not just the key column)
    out_schema = pa_schema_of(left, columns)

    def rprep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema([(right_key, pa.int64())]).empty_table()
        k = t.column(right_key).to_numpy(zero_copy_only=False).astype(I64)
        # per-batch combiner: distinct keys only enter the exchange
        return pa.table({right_key: pa.array(np.unique(k), pa.int64())})

    rproj = right.select_columns([right_key]).map_batches(rprep, batch_format="pyarrow")

    def bucket(tl: pa.Table, tr: pa.Table) -> pa.Table:
        if tl.num_rows == 0 or tl.num_columns == 0:
            return out_schema.empty_table()
        lk = tl.column(left_key).to_numpy(zero_copy_only=False).astype(I64)
        if tr.num_rows == 0 or tr.num_columns == 0:
            present = np.zeros(lk.shape[0], dtype=bool)
        else:
            rk = np.unique(tr.column(right_key).to_numpy(zero_copy_only=False).astype(I64))
            pos = np.searchsorted(rk, lk)
            present = (pos < rk.shape[0]) & (rk[np.minimum(pos, rk.shape[0] - 1)] == lk)
        keep = ~present if anti else present
        return tl.filter(pa.array(keep))

    from raydedup.stages.exchange import hash_exchange_join

    refs = hash_exchange_join(lproj, rproj, left_key, right_key, bucket)
    # empty buckets are dropped remotely (only row counts reach the
    # driver); a fully-empty result keeps the full projected schema
    return refs_to_dataset(refs, out_schema)
