"""Grouped z-score anomaly detection over the events table.

The statistics surface (`PanakoStorageKV.java:381-467` min/max/avg
scans) extended to the standard outlier flag an event pipeline runs:
per-group mean/std of the value column, emit events whose |z| clears a
threshold.

Scale shape — two stateless passes, zero shuffle:

1. per-batch integer-cent partials ``(group, n, Σcents, Σcents²)``
   merged on the driver (O(groups) rows; sums are exact int64, so the
   merge is order-insensitive and bit-stable at any parallelism);
2. a broadcast of the tiny group-stats dict into a scoring
   ``map_batches`` pass that computes z and filters.

Float discipline (cross-engine bit parity with the DuckDB oracle): all
aggregation happens in exact int64 (cents, cents²); the ONLY float ops
are the final mean/std/z expressions, written in the same association
order on both sides — each IEEE op is correctly rounded, so identical
expressions give identical doubles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64

_OUT_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("event_type", pa.string()),
        ("cents", pa.int64()),
        ("z", pa.float64()),
    ]
)


def _partials(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.int64()),
                "ssq": pa.array([], pa.int64()),
            }
        )
    v = t.column("value").to_numpy(zero_copy_only=False)
    cents = np.rint(v * 100.0).astype(I64)
    tt = t.append_column("cents", pa.array(cents, pa.int64()))
    tt = tt.append_column("c2", pa.array(cents * cents, pa.int64()))
    g = tt.group_by("event_type").aggregate(
        [([], "count_all"), ("cents", "sum"), ("c2", "sum")]
    )
    return g.rename_columns(["event_type", "n", "s", "ssq"])


def event_zscores(
    events: Dataset, *, z_min: float = 2.0, value_scale: int = 100
) -> Dataset:
    """events(event_id, event_type, value) -> events with
    |z| >= z_min within their event_type, z computed against the
    group's own mean/std (population variance).

    Groups with zero variance (or a single event) emit nothing — z is
    undefined there, matching the SQL mirror's NULL-division filter.
    """

    def prep(t: pa.Table) -> pa.Table:
        return t.select(["event_id", "event_type", "value"])

    parts = (
        events.map_batches(prep, batch_format="pyarrow")
        .map_batches(_partials, batch_format="pyarrow")
        .to_pandas()
    )
    if len(parts) == 0:
        stats: dict[str, tuple[int, int, int]] = {}
    else:
        merged = parts.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), s=("s", "sum"), ssq=("ssq", "sum")
        )
        stats = {
            r.event_type: (int(r.n), int(r.s), int(r.ssq))
            for r in merged.itertuples()
        }

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = np.rint(v * float(value_scale)).astype(I64)
        types = t.column("event_type").to_pylist()
        z = np.full(t.num_rows, np.nan, dtype=np.float64)
        # score per group present in this batch (few groups, vector math)
        arr_types = np.asarray(types, dtype=object)
        for g in set(types):
            st = stats.get(g)
            if st is None:
                continue
            n, s, ssq = st
            num = n * ssq - s * s
            if n < 2 or num <= 0:
                continue
            std = np.sqrt(np.float64(num) / (np.float64(n) * np.float64(n)))
            m = arr_types == g
            z[m] = (cents[m].astype(np.float64) - np.float64(s) / np.float64(n)) / std
        keep = np.abs(z) >= z_min
        keep &= ~np.isnan(z)
        idx = np.flatnonzero(keep)
        sub = t.take(pa.array(idx, pa.int64()))
        return pa.table(
            {
                "event_id": sub.column("event_id").cast(pa.int64()),
                "event_type": sub.column("event_type").cast(pa.string()),
                "cents": pa.array(cents[idx], pa.int64()),
                "z": pa.array(z[idx], pa.float64()),
            }
        )

    return events.map_batches(prep, batch_format="pyarrow").map_batches(
        score, batch_format="pyarrow"
    )
