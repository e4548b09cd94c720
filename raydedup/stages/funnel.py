"""Event funnel analysis: users completing an ordered event-type
sequence (view -> click -> purchase), earliest-completion semantics.

Companion to ``stages/sessions.py`` on the events table: step ``i`` is
matched at the user's EARLIEST event of ``steps[i]`` strictly after
their step ``i-1`` match time (greedy-earliest matching, which is
optimal for sequence existence). Returns per-step reach counts — the
conversion funnel every event pipeline reports.

Scale shape: ONE hash exchange keyed on ``user_id`` (funnel state is
per-user, like sessionization); the in-bucket kernel does one lexsort
per step over only that step's events — no per-user Python. Step
counts are summed across buckets on the driver (``n_steps`` integers
per bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64

_NEG_INF = np.iinfo(np.int64).min


def _funnel_bucket(t: pa.Table, steps: list[str]) -> pa.Table:
    out_schema = pa.schema([("step", pa.int64()), ("n_users", pa.int64())])
    if t.num_rows == 0 or t.num_columns == 0:
        return out_schema.empty_table()
    import pyarrow.compute as pc

    et = t.column("event_type")
    counts = np.zeros(len(steps), dtype=I64)

    # users matched so far, with their match time; starts as "all users
    # at -inf" implicitly — realized at step 0 from that step's events
    cur_users: np.ndarray | None = None
    cur_times: np.ndarray | None = None
    for i, s in enumerate(steps):
        sub = t.filter(pc.equal(et, s))
        if sub.num_rows == 0:
            break
        u = sub.column("user_id").to_numpy(zero_copy_only=False).astype(I64)
        ts = sub.column("ts").to_numpy(zero_copy_only=False).view(I64)
        if cur_users is None:
            prev_t = np.full(u.shape[0], _NEG_INF, dtype=I64)
        else:
            pos = np.searchsorted(cur_users, u)
            ok = (pos < cur_users.shape[0]) & (
                cur_users[np.minimum(pos, cur_users.shape[0] - 1)] == u
            )
            prev_t = np.where(ok, cur_times[np.minimum(pos, cur_times.shape[0] - 1)], np.iinfo(np.int64).max)
        valid = ts > prev_t
        if not valid.any():
            break
        uv, tv = u[valid], ts[valid]
        order = np.lexsort((tv, uv))
        uv, tv = uv[order], tv[order]
        first = np.empty(uv.shape[0], dtype=bool)
        first[0] = True
        first[1:] = uv[1:] != uv[:-1]
        cur_users, cur_times = uv[first], tv[first]
        counts[i] = cur_users.shape[0]
        if cur_users.shape[0] == 0:
            break

    return pa.table(
        {
            "step": pa.array(np.arange(1, len(steps) + 1, dtype=I64), pa.int64()),
            "n_users": pa.array(counts, pa.int64()),
        }
    )


def funnel(events: Dataset, steps: list[str]) -> pa.Table:
    """events(user_id, ts, event_type) -> (step, event_type, n_users):
    users reaching each step of the ordered ``steps`` sequence under
    earliest-completion matching."""
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    from raydedup.stages.exchange import cast_columns, hash_exchange_apply

    schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_type", pa.large_string()),
        ]
    )

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        keep = pc.is_in(t.column("event_type"), value_set=pa.array(list(set(steps))))
        return cast_columns(t.filter(keep), schema)

    prepped = events.select_columns(["user_id", "ts", "event_type"]).map_batches(
        prep, batch_format="pyarrow"
    )
    per_bucket = hash_exchange_apply(
        prepped, "user_id", lambda t: _funnel_bucket(t, list(steps))
    )
    counts = np.zeros(len(steps), dtype=I64)
    if per_bucket.num_rows:
        st = per_bucket.column("step").to_numpy(zero_copy_only=False).astype(I64)
        nu = per_bucket.column("n_users").to_numpy(zero_copy_only=False).astype(I64)
        np.add.at(counts, st - 1, nu)
    return pa.table(
        {
            "step": pa.array(np.arange(1, len(steps) + 1, dtype=I64), pa.int64()),
            "event_type": pa.array(list(steps), pa.large_string()),
            "n_users": pa.array(counts, pa.int64()),
        }
    )
