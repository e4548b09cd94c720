"""Rolling distinct active users (WAU-style) over the events table.

For every activity day D, count users with any event in the window
``[D - window + 1, D]`` — the rolling-distinct metric (DAU is
``window=1``, WAU ``window=7``). Distinct-across-a-window cannot be
expressed as a sum of per-day counts, which is what makes it a real
distributed operator rather than a groupby.

Scale shape: ONE hash exchange keyed on ``user_id``. Each user lives
in exactly one bucket, so per-bucket distinct-user counts per output
day SUM correctly across buckets. In-bucket: distinct (user, day)
pairs (one lexsort), each expanded to its ``window`` output days with
a vectorized repeat/arange, (user, D) deduped with a second lexsort,
then per-D partial counts. Buckets also emit their distinct activity
days so the driver can restrict output to days that actually occur
(the SQL mirror's ``days`` CTE); the driver merge is O(days) — tiny.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64

_DAY_US = 86_400_000_000

_OUT_SCHEMA = pa.schema([("d", pa.int64()), ("n_users", pa.int64())])


def _active_bucket(t: pa.Table, window: int) -> pa.Table:
    """-> (kind, d, n): kind 0 rows mark activity days present in this
    bucket; kind 1 rows carry partial distinct-user counts per output
    day."""
    empty = pa.schema(
        [("kind", pa.int64()), ("d", pa.int64()), ("n", pa.int64())]
    ).empty_table()
    if t.num_rows == 0 or t.num_columns == 0:
        return empty
    u = t.column("user_id").to_numpy(zero_copy_only=False).astype(I64)
    day = t.column("ts").to_numpy(zero_copy_only=False).view(I64) // _DAY_US

    # distinct (user, day)
    order = np.lexsort((day, u))
    us, ds_ = u[order], day[order]
    new = np.empty(us.shape[0], dtype=bool)
    new[0] = True
    new[1:] = (us[1:] != us[:-1]) | (ds_[1:] != ds_[:-1])
    us, ds_ = us[new], ds_[new]

    # expand each activity day to its `window` output days
    rep_u = np.repeat(us, window)
    rep_d = np.repeat(ds_, window) + np.tile(np.arange(window, dtype=I64), us.shape[0])
    # dedupe (user, D)
    order = np.lexsort((rep_d, rep_u))
    ru, rd_ = rep_u[order], rep_d[order]
    new = np.empty(ru.shape[0], dtype=bool)
    new[0] = True
    new[1:] = (ru[1:] != ru[:-1]) | (rd_[1:] != rd_[:-1])
    out_d, counts = np.unique(rd_[new], return_counts=True)

    act_days = np.unique(ds_)
    return pa.table(
        {
            "kind": pa.array(
                np.concatenate(
                    [np.zeros(act_days.shape[0], I64), np.ones(out_d.shape[0], I64)]
                ),
                pa.int64(),
            ),
            "d": pa.array(np.concatenate([act_days, out_d]), pa.int64()),
            "n": pa.array(
                np.concatenate([np.ones(act_days.shape[0], I64), counts.astype(I64)]),
                pa.int64(),
            ),
        }
    )


def rolling_active_users(events: Dataset, window: int = 7) -> pa.Table:
    """events(user_id, ts) -> (d, n_users): for each activity day ``d``
    (epoch days), the distinct users with any event in the ``window``
    days ending at ``d``. Sorted by d."""
    if window < 1:
        raise ValueError("window must be >= 1")
    from raydedup.stages.exchange import cast_columns, hash_exchange_apply

    schema = pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))])
    prepped = events.select_columns(["user_id", "ts"]).map_batches(
        lambda t: cast_columns(t, schema), batch_format="pyarrow"
    )
    parts = hash_exchange_apply(
        prepped, "user_id", lambda t: _active_bucket(t, int(window))
    )
    if parts.num_rows == 0:
        return _OUT_SCHEMA.empty_table()
    kind = parts.column("kind").to_numpy(zero_copy_only=False)
    d = parts.column("d").to_numpy(zero_copy_only=False).astype(I64)
    n = parts.column("n").to_numpy(zero_copy_only=False).astype(I64)
    days_present = np.unique(d[kind == 0])
    cd, cn = d[kind == 1], n[kind == 1]
    uniq, inv = np.unique(cd, return_inverse=True)
    sums = np.zeros(uniq.shape[0], dtype=I64)
    np.add.at(sums, inv, cn)
    keep = np.isin(uniq, days_present)
    return pa.table(
        {
            "d": pa.array(uniq[keep], pa.int64()),
            "n_users": pa.array(sums[keep], pa.int64()),
        }
    )
