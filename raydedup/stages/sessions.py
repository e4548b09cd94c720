"""Event sessionization: gap-based user sessions over the events table.

The monitor/windowing surface (`stages/windows.py`, W1) extended to the
classic event-pipeline operator: group each user's events into sessions
separated by inactivity gaps > ``gap``. A session cannot be computed
batch-locally (it needs the user's full timeline), so this is ONE hash
exchange keyed on ``user_id`` — the kernel sees every event of its
users and nothing else (the module's stated partitioning assumption).

In-bucket the kernel is fully vectorized: one lexsort by
``(user_id, ts, event_id)`` (event_id breaks timestamp ties
deterministically), session starts are a boolean edge array
(user change OR gap exceeded), and per-session aggregates fall out of
``np.add.reduceat`` / slicing on the contiguous session runs — no
per-user or per-session Python.

Value sums are exact integer cents (``round(value*100)``), the repo's
cross-engine parity rule for float aggregation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64

_OUT_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("n_events", pa.int64()),
        ("t_start", pa.timestamp("us")),
        ("t_end", pa.timestamp("us")),
        ("sum_value_cents", pa.int64()),
    ]
)


def _sessionize_bucket(t: pa.Table, gap_us: int) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        return _OUT_SCHEMA.empty_table()
    u = t.column("user_id").to_numpy(zero_copy_only=False).astype(I64)
    ts = t.column("ts").to_numpy(zero_copy_only=False).view(I64)
    eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(I64)
    cents = t.column("value_cents").to_numpy(zero_copy_only=False).astype(I64)

    order = np.lexsort((eid, ts, u))
    u, ts, cents = u[order], ts[order], cents[order]

    new_sess = np.empty(u.shape[0], dtype=bool)
    new_sess[0] = True
    new_sess[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)

    starts = np.flatnonzero(new_sess)
    # per-user 1-based session ordinal: global session ordinal minus the
    # ordinal at the user's first session
    sess_ord = np.cumsum(new_sess)  # 1-based global ordinal per row
    user_first = np.empty(u.shape[0], dtype=bool)
    user_first[0] = True
    user_first[1:] = u[1:] != u[:-1]
    ufirst_pos = np.flatnonzero(user_first)
    run_len_user = np.diff(ufirst_pos, append=I64(u.shape[0]))
    base = np.repeat(sess_ord[ufirst_pos], run_len_user)
    session_id_rows = sess_ord - base + 1

    ends = np.append(starts[1:], u.shape[0]) - 1
    n_events = np.append(starts[1:], u.shape[0]) - starts
    sum_cents = np.add.reduceat(cents, starts)
    return pa.table(
        {
            "user_id": pa.array(u[starts], type=pa.int64()),
            "session_id": pa.array(session_id_rows[starts], type=pa.int64()),
            "n_events": pa.array(n_events.astype(I64), type=pa.int64()),
            "t_start": pa.array(ts[starts].view("datetime64[us]")),
            "t_end": pa.array(ts[ends].view("datetime64[us]")),
            "sum_value_cents": pa.array(sum_cents.astype(I64), type=pa.int64()),
        }
    )


def sessionize(events: Dataset, gap_s: int = 1800) -> Dataset:
    """events(event_id, ts, user_id, value) -> one row per (user_id,
    session_id) with event count, span, and exact cent-sum. Sessions
    split where the inactivity gap exceeds ``gap_s`` seconds.

    Returns a DATASET (one block per exchange bucket): the session
    table is row-proportional to the input — at corpus scale it must
    stream to a sink, never land on the driver.
    """
    import ray.data as rd

    from raydedup.stages.exchange import cast_columns, hash_exchange_apply

    base = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("event_id", pa.int64())]
    )
    out_cols = pa.schema(list(base) + [("value_cents", pa.int64())])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_cols.empty_table()
        v = t.column("value").to_numpy(zero_copy_only=False)
        # np.rint + SQL round(value*100, 0): the repo's proven cent pair
        # (values are 2-decimal, never exactly .5)
        return cast_columns(t, base).append_column(
            "value_cents", pa.array(np.rint(v * 100).astype(I64), type=pa.int64())
        )

    prepped = events.select_columns(["event_id", "ts", "user_id", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    gap_us = int(gap_s) * 1_000_000
    refs = hash_exchange_apply(
        prepped, "user_id", lambda t: _sessionize_bucket(t, gap_us), collect=False
    )
    if not refs:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    return rd.from_arrow_refs(refs)
