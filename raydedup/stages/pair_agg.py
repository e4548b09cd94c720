"""High-cardinality (a, b)-keyed aggregation without Ray's Aggregate.

Ray Data's sort-based ``groupby(keys).aggregate(...)`` pays per-group
Python overhead — catastrophic when nearly every row is its own group
(candidate pair tables: millions of rows, ~1 group per row; measured
~2.5k rows/s/task). This module hash-buckets the pair key into a small
number of coarse groups and reduces each bucket with vectorized
``np.add.reduceat`` / ``np.minimum.reduceat`` — the same
partial-aggregate-then-small-shuffle shape the engine uses everywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from raydedup.hashing import U64, mix64

I64 = np.int64


def reduce_pair_table(
    t: pa.Table, sum_cols: list[str], min_cols: list[str] | None = None
) -> pa.Table:
    """Vectorized (a, b) aggregation of one in-memory table: sum
    ``sum_cols``, min ``min_cols`` (lexsort + reduceat, no per-group
    Python)."""
    min_cols = min_cols or []
    a = t.column("a").to_numpy(zero_copy_only=False)
    b = t.column("b").to_numpy(zero_copy_only=False)
    n = a.shape[0]
    if n == 0:
        cols = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
        for c in sum_cols + min_cols:
            cols[c] = pa.array([], t.schema.field(c).type)
        return pa.table(cols)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    boundary[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(boundary)
    cols = {
        "a": pa.array(a[starts], type=pa.int64()),
        "b": pa.array(b[starts], type=pa.int64()),
    }
    for c in sum_cols:
        v = t.column(c).to_numpy(zero_copy_only=False)[order]
        cols[c] = pa.array(np.add.reduceat(v, starts), type=t.schema.field(c).type)
    for c in min_cols:
        v = t.column(c).to_numpy(zero_copy_only=False)[order]
        cols[c] = pa.array(np.minimum.reduceat(v, starts), type=t.schema.field(c).type)
    return pa.table(cols)


def aggregate_pair_table(
    pairs: Dataset,
    sum_cols: list[str],
    min_cols: list[str] | None = None,
    num_buckets: int = 64,
) -> Dataset:
    """Group by (a, b); sum ``sum_cols`` and min ``min_cols``, vectorized.

    Equivalent to ``groupby(["a","b"]).aggregate(Sum(...), Min(...))``
    but with one shuffle group per hash bucket and a reduceat kernel per
    bucket instead of per-group Python.
    """
    min_cols = min_cols or []

    def add_bucket(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False).view(U64)
        b = t.column("b").to_numpy(zero_copy_only=False).view(U64)
        h = mix64(a * np.uint64(0x9E3779B97F4A7C15) + b)
        bucket = (h % np.uint64(num_buckets)).astype(I64)
        return t.append_column("bucket", pa.array(bucket, type=pa.int64()))

    def reduce_bucket(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        n = a.shape[0]
        if n == 0:
            cols = {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
            for c in sum_cols + min_cols:
                cols[c] = pa.array([], t.schema.field(c).type)
            return pa.table(cols)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        boundary = np.empty(n, dtype=bool)
        boundary[0] = True
        boundary[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(boundary)
        cols: dict[str, pa.Array] = {
            "a": pa.array(a[starts], type=pa.int64()),
            "b": pa.array(b[starts], type=pa.int64()),
        }
        for c in sum_cols:
            v = t.column(c).to_numpy(zero_copy_only=False)[order]
            cols[c] = pa.array(np.add.reduceat(v, starts), type=t.schema.field(c).type)
        for c in min_cols:
            v = t.column(c).to_numpy(zero_copy_only=False)[order]
            cols[c] = pa.array(
                np.minimum.reduceat(v, starts), type=t.schema.field(c).type
            )
        return pa.table(cols)

    bucketed = pairs.map_batches(add_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(reduce_bucket, batch_format="pyarrow")
