"""Windowed aggregates over the events stream table.

The monitor-windowing analog on stream-shaped data
(``OlafStrategy.java:561-573``: fixed windows, step = window − overlap).
Ray Data has no event-time watermarks; windows are computed as a
groupby on (key, window_start) after a vectorized bucket projection —
exactly the `GROUP BY key, date_trunc(...)` shape the oracle SQL uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def tumbling_window_agg(
    events: Dataset,
    window_s: int = 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> Dataset:
    """Per-key tumbling windows: (key, window_start, n_events, sum/avg/max).

    Ordering assumption: none — the bucket is a pure row-wise projection,
    so late/out-of-order rows land in the right window regardless of
    arrival order (no watermark semantics to honor in batch)."""
    us = np.int64(window_s) * 1_000_000

    def add_window(t: pa.Table) -> pa.Table:
        ts = t.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        start = (ts // us) * us
        return t.append_column(
            "window_start", pa.array(start, type=pa.int64()).cast(pa.timestamp("us"))
        )

    windowed = events.select_columns([key_col, ts_col, value_col]).map_batches(
        add_window, batch_format="pyarrow"
    )
    return windowed.groupby([key_col, "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum(value_col, alias_name="sum_value"),
        Mean(value_col, alias_name="avg_value"),
        Max(value_col, alias_name="max_value"),
        Min(value_col, alias_name="min_value"),
    )


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
        return pa.table(
            {
                key_col: pa.array(key[idx]),
                "window_start": pa.array(flat_starts, type=pa.int64()).cast(
                    pa.timestamp("us")
                ),
                value_col: pa.array(val[idx]),
            }
        )

    exploded = events.select_columns([key_col, ts_col, value_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    return exploded.groupby([key_col, "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Sum(value_col, alias_name="sum_value"),
    )
