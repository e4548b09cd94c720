"""Windowed aggregates over the events stream table.

The monitor-windowing analog on stream-shaped data
(``OlafStrategy.java:561-573``: fixed windows, step = window − overlap).
Ray Data has no event-time watermarks; windows are computed as a
vectorized bucket projection followed by a (key, window_start) grouped
aggregation — exactly the `GROUP BY key, date_trunc(...)` shape the
oracle SQL uses.

Grouping runs on the custom hash exchange with a reduceat kernel per
bucket, NOT Ray's sort-based ``groupby().aggregate()`` — high-cardinality
(key, window) spaces hit the measured per-group-Python cliff (the same
reason candidate pairs use ``pair_agg``). Rows are hash-bucketed by a
mixed 64-bit key of (key, window); grouping inside the bucket uses the
REAL columns, so key-hash collisions only affect bucket balance, never
results.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from raydedup.hashing import hash_pair_u64

I64 = np.int64


def _grouped_reduce(
    t: pa.Table,
    key_col: str,
    value_col: str,
    with_minmax: bool,
    with_avg: bool,
) -> pa.Table:
    """Vectorized (key, window_start) aggregation of one exchange bucket."""
    if t.num_rows == 0:
        cols: dict[str, pa.Array] = {
            key_col: pa.array([], t.schema.field(key_col).type),
            "window_start": pa.array([], pa.timestamp("us")),
            "n_events": pa.array([], pa.int64()),
            "sum_value": pa.array([], t.schema.field(value_col).type),
        }
        if with_avg:
            cols["avg_value"] = pa.array([], pa.float64())
        if with_minmax:
            cols["max_value"] = pa.array([], t.schema.field(value_col).type)
            cols["min_value"] = pa.array([], t.schema.field(value_col).type)
        return pa.table(cols)
    keys = t.column(key_col).to_numpy(zero_copy_only=False)
    ws = t.column("window_start").cast(pa.int64()).to_numpy(zero_copy_only=False)
    val = t.column(value_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ws, keys))
    keys, ws, val = keys[order], ws[order], val[order]
    n = keys.shape[0]
    b = np.empty(n, dtype=bool)
    b[0] = True
    b[1:] = (keys[1:] != keys[:-1]) | (ws[1:] != ws[:-1])
    starts = np.flatnonzero(b)
    counts = np.diff(np.append(starts, n))
    sums = np.add.reduceat(val, starts)
    cols = {
        key_col: pa.array(keys[starts], type=t.schema.field(key_col).type),
        "window_start": pa.array(ws[starts], type=pa.int64()).cast(pa.timestamp("us")),
        "n_events": pa.array(counts.astype(np.int64), type=pa.int64()),
        "sum_value": pa.array(sums, type=t.schema.field(value_col).type),
    }
    if with_avg:
        cols["avg_value"] = pa.array(
            sums.astype(np.float64) / counts, type=pa.float64()
        )
    if with_minmax:
        cols["max_value"] = pa.array(
            np.maximum.reduceat(val, starts), type=t.schema.field(value_col).type
        )
        cols["min_value"] = pa.array(
            np.minimum.reduceat(val, starts), type=t.schema.field(value_col).type
        )
    return pa.table(cols)


def _exchange_windows(
    windowed: Dataset,
    key_col: str,
    value_col: str,
    with_minmax: bool,
    with_avg: bool,
) -> Dataset:
    import ray.data as rd

    from raydedup.stages.exchange import hash_exchange_apply

    out = hash_exchange_apply(
        windowed,
        "xkey",
        lambda t: _grouped_reduce(t, key_col, value_col, with_minmax, with_avg),
    )
    return rd.from_arrow(out)


def _with_window_key(
    t: pa.Table, key_col: str, ts_col: str | None, start: np.ndarray
) -> pa.Table:
    """Append window_start + the mixed exchange key; drop the raw ts."""
    keys = t.column(key_col).to_numpy(zero_copy_only=False)
    xkey = hash_pair_u64(keys.view(np.uint64), start.view(np.uint64)).view(I64)
    t = t.append_column(
        "window_start", pa.array(start, type=pa.int64()).cast(pa.timestamp("us"))
    ).append_column("xkey", pa.array(xkey, type=pa.int64()))
    return t.drop_columns([ts_col]) if ts_col else t


def tumbling_window_agg(
    events: Dataset,
    window_s: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> Dataset:
    """Per-key tumbling windows: (key, window_start, n_events, sum/avg/max/min).

    Ordering assumption: none — the bucket is a pure row-wise projection,
    so late/out-of-order rows land in the right window regardless of
    arrival order (no watermark semantics to honor in batch)."""
    us = np.int64(window_s) * 1_000_000

    def add_window(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        start = (ts // us) * us
        return _with_window_key(t, key_col, ts_col, start)

    windowed = events.select_columns([key_col, ts_col, value_col]).map_batches(
        add_window, batch_format="pyarrow"
    )
    return _exchange_windows(windowed, key_col, value_col, with_minmax=True, with_avg=True)


def sliding_window_agg(
    events: Dataset,
    window_s: int = 3600,
    step_s: int = 900,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> Dataset:
    """Per-key sliding windows (window_s wide, step_s apart): each event
    replicates into ceil(window/step) windows via a flat-map-shaped
    map_batches (the 25 s / 5 s-overlap monitor window analog)."""
    us_step = np.int64(step_s) * 1_000_000
    us_win = np.int64(window_s) * 1_000_000
    reps = int(window_s // step_s)

    def explode(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        key = t.column(key_col).to_numpy(zero_copy_only=False)
        val = t.column(value_col).to_numpy(zero_copy_only=False)
        n = ts.shape[0]
        # window starts covering each event: latest start <= ts, going back
        last_start = (ts // us_step) * us_step
        starts = last_start[:, None] - np.arange(reps, dtype=np.int64)[None, :] * us_step
        valid = (starts + us_win) > ts[:, None]
        flat_starts = starts.ravel()[valid.ravel()]
        idx = np.repeat(np.arange(n), reps)[valid.ravel()]
        out = pa.table(
            {
                key_col: pa.array(key[idx]),
                value_col: pa.array(val[idx]),
            }
        )
        return _with_window_key(out, key_col, None, flat_starts)

    exploded = events.select_columns([key_col, ts_col, value_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    return _exchange_windows(exploded, key_col, value_col, with_minmax=False, with_avg=False)
