"""Exact distributed quantiles over an integer column.

The corpus-statistics surface (``cli/Stats.java`` /
``PanakoStorageKV.java:381-467`` reports min/max/avg over the index)
extended to exact percentiles — the length/token-count distribution
cuts every training-data pipeline reports.

Scale shape: a full ``sort`` is the naive O(n log n) all-to-all; this
stage ships only **value counts**. Per batch, ``np.unique`` collapses
rows to ``(value, count)`` partials (the combiner); ONE hash exchange
on the value sums partials; the driver merges the reduced table —
whose size is the number of DISTINCT values, not rows (lengths and
token counts live in a few-thousand-wide domain no matter how many
documents exist). Quantile ranks use pure integer arithmetic
(``rank = ceil(pct * n / 100)`` as ``(pct*n + 99) // 100``) so there
is no float-boundary ambiguity to disagree with an oracle over.

Definition (lower discrete quantile): the ``pct``-th percentile is the
smallest value whose cumulative count reaches ``rank``; ``pct=100`` is
the maximum, ``pct=0`` is clamped to rank 1 (the minimum).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64


def _partial_counts(t: pa.Table, col: str, by: str | None) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        cols = {"v": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
        if by is not None:
            cols[by] = pa.array([], pa.large_string())
        return pa.table(cols)
    v = t.column(col).to_numpy(zero_copy_only=False).astype(I64)
    if by is None:
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(u, pa.int64()), "c": pa.array(c.astype(I64), pa.int64())}
        )
    g = t.column(by).dictionary_encode().combine_chunks()
    codes = np.asarray(g.indices)
    order = np.lexsort((v, codes))
    cs, vs = codes[order], v[order]
    new = np.empty(vs.shape[0], dtype=bool)
    new[0] = True
    new[1:] = (vs[1:] != vs[:-1]) | (cs[1:] != cs[:-1])
    starts = np.flatnonzero(new)
    run = np.diff(starts, append=I64(vs.shape[0]))
    gvals = g.dictionary.take(pa.array(cs[starts], pa.int32()))
    return pa.table(
        {
            by: gvals.cast(pa.large_string()),
            "v": pa.array(vs[starts], pa.int64()),
            "c": pa.array(run.astype(I64), pa.int64()),
        }
    )


def exact_quantiles(
    ds: Dataset,
    col: str,
    pcts: Sequence[int] = (25, 50, 90, 99),
    by: str | None = None,
) -> pa.Table:
    """``docs[col]`` (integer) -> exact percentile table.

    Returns ``(pct, value)`` sorted by pct, or ``(by, pct, value)``
    sorted by (by, pct) when a group column is given. Only distinct
    ``(group, value)`` count rows cross the exchange; the driver merge
    is O(distinct values), never O(rows).
    """
    from raydedup.stages.exchange import hash_exchange_apply

    if not pcts:
        raise ValueError("exact_quantiles needs at least one percentile")
    bad = [p for p in pcts if not 0 <= int(p) <= 100]
    if bad:
        raise ValueError(f"percentiles must be in [0, 100], got {bad}")

    partials = ds.map_batches(
        lambda t: _partial_counts(t, col, by), batch_format="pyarrow"
    )

    group_cols = ([by] if by is not None else []) + ["v"]

    def reduce_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return t.group_by(group_cols).aggregate([("c", "sum")]).rename_columns(
            group_cols + ["c"]
        )

    red = hash_exchange_apply(partials, "v", reduce_bucket)
    pcts_arr = np.asarray(sorted(set(int(p) for p in pcts)), dtype=I64)

    def cuts(v: np.ndarray, c: np.ndarray) -> np.ndarray:
        order = np.argsort(v)
        v, c = v[order], c[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        ranks = np.maximum((pcts_arr * n + 99) // 100, 1)
        return v[np.searchsorted(cum, ranks, side="left")]

    if red.num_rows == 0:
        cols = {"pct": pa.array([], pa.int64()), "value": pa.array([], pa.int64())}
        if by is not None:
            cols = {by: pa.array([], pa.large_string()), **cols}
        return pa.table(cols)

    v = red.column("v").to_numpy(zero_copy_only=False).astype(I64)
    c = red.column("c").to_numpy(zero_copy_only=False).astype(I64)
    if by is None:
        return pa.table(
            {
                "pct": pa.array(pcts_arr, pa.int64()),
                "value": pa.array(cuts(v, c), pa.int64()),
            }
        )

    groups = red.column(by).to_numpy(zero_copy_only=False)
    out_g: list[str] = []
    out_p: list[np.ndarray] = []
    out_v: list[np.ndarray] = []
    for gname in sorted(set(groups.tolist())):
        m = groups == gname
        out_g.extend([gname] * pcts_arr.shape[0])
        out_p.append(pcts_arr)
        out_v.append(cuts(v[m], c[m]))
    return pa.table(
        {
            by: pa.array(out_g, pa.large_string()),
            "pct": pa.array(np.concatenate(out_p), pa.int64()),
            "value": pa.array(np.concatenate(out_v), pa.int64()),
        }
    )
