"""Keep-latest snapshot dedup: one surviving row per key, the row with
the maximum order value (ties -> minimum tie value).

The Common-Crawl operation this models: a url crawled in several
snapshots appears once per crawl; training pipelines keep the newest
capture per url (the reference's analog is the store's skip-if-present
id check inverted to prefer the freshest resource,
``cli/Store.java:119-127``).

Scale shape — combiner FIRST, then one exchange:

  per-batch partial argmax  ->  hash exchange on key  ->  bucket argmax

The per-batch combiner shrinks the exchange payload from |rows| to
~|distinct keys per batch| (for a url keyed corpus with S snapshots the
exchange moves ~1/S of the input), and argmax under the lexicographic
(-order, tie) order is associative, so partial-then-final selection is
exact. In-bucket work is one lexsort + run-boundary mask — no per-key
Python. Group identity inside a bucket is the REAL key value
(dictionary codes), not its 64-bit hash, so two colliding keys still
reduce independently (same convention as stages/grouptopk.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64


def _order_i64(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Order column as a sortable int64/float view (timestamps -> their
    microsecond counts; lexsort can't negate datetime64)."""
    v = arr.to_numpy(zero_copy_only=False)
    if np.issubdtype(v.dtype, np.datetime64):
        return v.astype("datetime64[us]").astype(I64)
    return v


def _argmax_per_key(t: pa.Table, key_col: str, order_col: str, tie_col: str) -> pa.Table:
    """Rows winning (order DESC, tie ASC) within each key — one lexsort
    + first-of-run mask. Pure function of the row SET (row-order
    insensitive), usable as both the combiner and the bucket reducer."""
    import pyarrow.compute as pc

    ks = t.column(key_col)
    if pa.types.is_string(ks.type) or pa.types.is_large_string(ks.type):
        codes = pc.dictionary_encode(
            ks.combine_chunks() if isinstance(ks, pa.ChunkedArray) else ks
        )
        gid = codes.indices.to_numpy(zero_copy_only=False).astype(I64)
    else:
        gid = ks.to_numpy(zero_copy_only=False).astype(I64)
    ov = _order_i64(t.column(order_col))
    tv = t.column(tie_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((tv, -ov, gid))
    gid_s = gid[order]
    first = np.empty(gid_s.shape[0], dtype=bool)
    if first.shape[0]:
        first[0] = True
        first[1:] = gid_s[1:] != gid_s[:-1]
    return t.take(pa.array(order[np.flatnonzero(first)]))


def keep_latest(
    ds: Dataset,
    key_col: str,
    order_col: str,
    tie_col: str,
    columns: list[str] | None = None,
) -> Dataset:
    """ds -> the single row per ``key_col`` with the greatest
    ``order_col`` (ties -> least ``tie_col``). ``columns`` defaults to
    [key_col, order_col, tie_col]; must include all three."""
    from raydedup.hashing import hash_strings_u64
    from raydedup.stages.exchange import (
        hash_exchange_apply,
        pa_schema_of,
        refs_to_dataset,
    )

    columns = columns or [key_col, order_col, tie_col]
    for c in (key_col, order_col, tie_col):
        if c not in columns:
            raise ValueError(f"columns must include {c}")
    out_schema = pa_schema_of(ds, columns)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table().append_column(
                "_kkey", pa.array([], pa.int64())
            )
        t = t.select(columns)
        t = _argmax_per_key(t, key_col, order_col, tie_col)
        ks = t.column(key_col)
        if pa.types.is_string(ks.type) or pa.types.is_large_string(ks.type):
            key = hash_strings_u64(ks.to_pylist(), mixed=True).view(I64)
        else:
            key = ks.to_numpy(zero_copy_only=False).astype(I64)
        return t.append_column("_kkey", pa.array(key, pa.int64()))

    prepped = ds.select_columns(columns).map_batches(combine, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        if t is None or t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        return _argmax_per_key(t, key_col, order_col, tie_col).select(columns)

    refs = hash_exchange_apply(prepped, "_kkey", bucket, collect=False)
    return refs_to_dataset(refs, out_schema)
