"""Windowed range join over the events table (inequality join).

The M9 time-window slicing surface (`OlafStrategy.java:175-201` filters
a fingerprint list to ``[start, start+n]`` seconds) generalized to the
relational inequality join Ray Data has no native operator for: for
every LEFT-type event, count (and time-bound) the same user's
RIGHT-type events inside the window ``[ts - window, ts)`` — strictly
before the left event, at most ``window`` back (e.g. "views in the 30
minutes before each purchase", the attribution-window join).

Scale shape: ONE hash exchange keyed on ``user_id``. In-bucket the
kernel is the union-sort two-probe trick: each left row contributes two
PROBE rows (at ``ts - window`` and at ``ts``), probes sort before right
rows at equal (user, ts) — one lexsort of rights + probes by
(user, ts, side), one cumsum over the right-row flag, and the window
count is the difference of the two probes' cumsum readings (both probes
share the user, so per-user offsets cancel). No per-user or per-row
Python; O((L+R) log(L+R)) per bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64

_OUT_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("n_in_window", pa.int64()),
    ]
)


def _window_bucket(t: pa.Table, window_us: int) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        return _OUT_SCHEMA.empty_table()
    u = t.column("user_id").to_numpy(zero_copy_only=False).astype(I64)
    ts = t.column("ts").to_numpy(zero_copy_only=False).view(I64)
    eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(I64)
    is_r = t.column("is_right").to_numpy(zero_copy_only=False).astype(bool)

    ru, rts = u[is_r], ts[is_r]
    lo_mask = ~is_r
    lu, lts, leid = u[lo_mask], ts[lo_mask], eid[lo_mask]
    if lu.shape[0] == 0:
        return _OUT_SCHEMA.empty_table()

    nr, nl = ru.shape[0], lu.shape[0]
    # union array: rights [0, nr) | hi probes [nr, nr+nl) at ts |
    # lo probes [nr+nl, nr+2nl) at ts - window
    cu = np.concatenate((ru, lu, lu))
    cts = np.concatenate((rts, lts, lts - window_us))
    kind = np.concatenate(
        (np.ones(nr, dtype=np.int8), np.zeros(2 * nl, dtype=np.int8))
    )
    # probes (0) sort BEFORE rights (1) at equal (user, ts): the count a
    # probe reads is "rights strictly below my ts" — the strict upper
    # bound and the closed lower bound both want exactly that reading
    order = np.lexsort((kind, cts, cu))
    inv = np.empty(order.shape[0], dtype=I64)
    inv[order] = np.arange(order.shape[0], dtype=I64)
    cum = np.cumsum(kind[order].astype(I64))
    hi_cnt = cum[inv[nr : nr + nl]]
    lo_cnt = cum[inv[nr + nl :]]
    n = (hi_cnt - lo_cnt).astype(I64)
    return pa.table(
        {
            "user_id": pa.array(lu, pa.int64()),
            "event_id": pa.array(leid, pa.int64()),
            "ts": pa.array(lts.view("datetime64[us]")),
            "n_in_window": pa.array(n, pa.int64()),
        }
    )


def window_count_join(
    events: Dataset,
    left_type: str,
    right_type: str,
    window_s: int = 1800,
) -> Dataset:
    """events -> one row per LEFT-type event with the count of the same
    user's RIGHT-type events in ``[ts - window_s, ts)`` (strict upper
    bound: a same-microsecond right event does not count)."""
    import ray.data as rd
    import pyarrow.compute as pc

    from raydedup.stages.exchange import cast_columns, hash_exchange_apply

    base = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("event_id", pa.int64())]
    )

    def prep(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(list(base) + [("is_right", pa.bool_())])
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        et = t.column("event_type")
        keep = pc.is_in(et, value_set=pa.array([left_type, right_type]))
        sub = t.filter(keep)
        flag = pc.equal(sub.column("event_type"), right_type)
        return cast_columns(sub, base).append_column(
            "is_right", flag.combine_chunks() if isinstance(flag, pa.ChunkedArray) else flag
        )

    prepped = events.select_columns(
        ["event_id", "ts", "user_id", "event_type"]
    ).map_batches(prep, batch_format="pyarrow")
    window_us = int(window_s) * 1_000_000
    refs = hash_exchange_apply(
        prepped, "user_id", lambda t: _window_bucket(t, window_us), collect=False
    )
    if not refs:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    return rd.from_arrow_refs(refs)
