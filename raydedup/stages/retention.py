"""Cohort retention over the events table.

Completes the events-analysis trio (sessionization, funnel, retention):
users are cohorted by the period of their FIRST event (period = epoch
floor, default one week) and each (cohort, offset) cell counts users
with any activity ``offset`` periods after their cohort period — the
retention triangle every event pipeline reports.

Scale shape: ONE hash exchange keyed on ``user_id`` (cohort identity
needs the user's full history). The in-bucket kernel is a single
lexsort over (user, period): the user's cohort is the first period of
its run, distinct (user, offset) pairs are boolean edges, and the
bucket emits per-(cohort, offset) partial counts — the driver merge
sums tiny partial tables (cohorts x offsets rows per bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64

_OUT_SCHEMA = pa.schema(
    [("cohort", pa.int64()), ("k", pa.int64()), ("n_users", pa.int64())]
)


def _retention_bucket(t: pa.Table, period_us: int) -> pa.Table:
    if t.num_rows == 0 or t.num_columns == 0:
        return _OUT_SCHEMA.empty_table()
    u = t.column("user_id").to_numpy(zero_copy_only=False).astype(I64)
    ts = t.column("ts").to_numpy(zero_copy_only=False).view(I64)
    per = ts // period_us

    order = np.lexsort((per, u))
    u, per = u[order], per[order]
    user_first = np.empty(u.shape[0], dtype=bool)
    user_first[0] = True
    user_first[1:] = u[1:] != u[:-1]
    ufirst_pos = np.flatnonzero(user_first)
    run_len = np.diff(ufirst_pos, append=I64(u.shape[0]))
    cohort = np.repeat(per[ufirst_pos], run_len)  # min period per user
    offset = per - cohort

    # distinct (user, offset) pairs: runs are sorted by (u, per) so
    # equal offsets for a user are adjacent
    new_pair = np.empty(u.shape[0], dtype=bool)
    new_pair[0] = True
    new_pair[1:] = (u[1:] != u[:-1]) | (offset[1:] != offset[:-1])
    c, k = cohort[new_pair], offset[new_pair]

    # count per (cohort, k) cell: one more lexsort + run boundaries —
    # no bit-packing, so no silent corruption for any period/offset range
    order = np.lexsort((k, c))
    cs, ks = c[order], k[order]
    new_cell = np.empty(cs.shape[0], dtype=bool)
    new_cell[0] = True
    new_cell[1:] = (cs[1:] != cs[:-1]) | (ks[1:] != ks[:-1])
    starts = np.flatnonzero(new_cell)
    counts = np.diff(starts, append=I64(cs.shape[0]))
    return pa.table(
        {
            "cohort": pa.array(cs[starts], type=pa.int64()),
            "k": pa.array(ks[starts], type=pa.int64()),
            "n_users": pa.array(counts.astype(I64), type=pa.int64()),
        }
    )


def retention(events: Dataset, period_s: int = 7 * 86400) -> pa.Table:
    """events(user_id, ts) -> (cohort, k, n_users): users cohorted by
    the epoch period of their first event; cell (cohort, k) counts
    users with any event k periods later. Sorted by (cohort, k)."""
    from raydedup.stages.exchange import cast_columns, hash_exchange_apply

    schema = pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))])
    prepped = events.select_columns(["user_id", "ts"]).map_batches(
        lambda t: cast_columns(t, schema), batch_format="pyarrow"
    )
    period_us = int(period_s) * 1_000_000
    parts = hash_exchange_apply(
        prepped, "user_id", lambda t: _retention_bucket(t, period_us)
    )
    if parts.num_rows == 0:
        return _OUT_SCHEMA.empty_table()
    # merge bucket partials (tiny: cohorts x offsets rows per bucket)
    g = parts.group_by(["cohort", "k"]).aggregate([("n_users", "sum")])
    g = g.rename_columns(["cohort", "k", "n_users"]).cast(_OUT_SCHEMA)
    idx = np.lexsort(
        (
            g.column("k").to_numpy(zero_copy_only=False),
            g.column("cohort").to_numpy(zero_copy_only=False),
        )
    )
    return g.take(pa.array(idx))
