"""As-of join over the events table: latest-prior-event attribution.

The J2 metadata-lookup surface (`strategy/panako/storage/PanakoStorageKV.java:154-179`
point lookup enriching a hit with its stored context) generalized to the
temporal join Ray Data has no native operator for: for every LEFT-type
event, find the most recent RIGHT-type event of the SAME user with
STRICTLY earlier timestamp (the classic attribution / enrichment as-of
join, e.g. purchase -> latest prior click).

Semantics (deterministic, total):

- match = the right event maximizing ``(ts, event_id)`` among right
  events with ``ts < left.ts`` for the same user — a right event at the
  SAME microsecond never matches (strict inequality), and same-``ts``
  right events tie-break to the larger ``event_id``.
- inner join: left events with no prior right event are dropped.

Scale shape: ONE hash exchange keyed on ``user_id`` (the partitioning
assumption: a bucket sees every event of its users and nothing else).
In-bucket the kernel is the union-sort as-of: ONE lexsort of both sides
by ``(user, ts, side, event_id)`` with left(0) before right(1) at equal
``ts`` (enforcing strictness), a cumsum over the right-side flag, and a
``rpos[cum-1]`` gather — no per-user or per-row Python anywhere. Output
is row-proportional to the left side and returned as a Dataset (one
block per bucket) so it streams to a sink at corpus scale.
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
        ("matched_event_id", pa.int64()),
        ("matched_ts", pa.timestamp("us")),
        ("lag_us", pa.int64()),
    ]
)


def _asof_bucket(t: pa.Table) -> pa.Table:
    """(user_id, ts, event_id, is_right) bucket -> matched left rows."""
    if t.num_rows == 0 or t.num_columns == 0:
        return _OUT_SCHEMA.empty_table()
    u = t.column("user_id").to_numpy(zero_copy_only=False).astype(I64)
    ts = t.column("ts").to_numpy(zero_copy_only=False).view(I64)
    eid = t.column("event_id").to_numpy(zero_copy_only=False).astype(I64)
    is_r = t.column("is_right").to_numpy(zero_copy_only=False).astype(bool)

    # Union sort: left rows sort BEFORE right rows at equal (user, ts),
    # so a same-microsecond right event is outside every left row's
    # "preceding" prefix (strict ts <). Same-ts right events order by
    # event_id ascending -> the prefix's LAST right row is the max-eid.
    order = np.lexsort((eid, is_r, ts, u))
    u, ts, eid, is_r = u[order], ts[order], eid[order], is_r[order]
    n = u.shape[0]

    rpos = np.flatnonzero(is_r)
    if rpos.shape[0] == 0:
        return _OUT_SCHEMA.empty_table()
    cum = np.cumsum(is_r)  # right rows at positions <= i (inclusive)

    # right-row count strictly before each user's first row
    user_first = np.empty(n, dtype=bool)
    user_first[0] = True
    user_first[1:] = u[1:] != u[:-1]
    ufirst_pos = np.flatnonzero(user_first)
    run_len = np.diff(ufirst_pos, append=I64(n))
    cum_at_start = np.repeat(cum[ufirst_pos] - is_r[ufirst_pos], run_len)

    left = ~is_r
    # a left row at i matches iff some right row of ITS user precedes it
    matched = left & (cum > cum_at_start)
    if not matched.any():
        return _OUT_SCHEMA.empty_table()
    midx = rpos[cum[matched] - 1]  # global index of the matched right row
    lag = ts[matched] - ts[midx]
    return pa.table(
        {
            "user_id": pa.array(u[matched], type=pa.int64()),
            "event_id": pa.array(eid[matched], type=pa.int64()),
            "ts": pa.array(ts[matched].view("datetime64[us]")),
            "matched_event_id": pa.array(eid[midx], type=pa.int64()),
            "matched_ts": pa.array(ts[midx].view("datetime64[us]")),
            "lag_us": pa.array(lag.astype(I64), type=pa.int64()),
        }
    )


def asof_join_events(
    events: Dataset, left_type: str, right_type: str
) -> Dataset:
    """events(event_id, ts, user_id, event_type) -> one row per
    LEFT-type event that has a strictly-earlier RIGHT-type event by the
    same user: (user_id, event_id, ts, matched_event_id, matched_ts,
    lag_us). See module docstring for the exact tie semantics."""
    import ray.data as rd

    from raydedup.stages.exchange import cast_columns, hash_exchange_apply

    base = pa.schema(
        [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("event_id", pa.int64())]
    )

    def prep(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

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
    refs = hash_exchange_apply(prepped, "user_id", _asof_bucket, collect=False)
    if not refs:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())
    return rd.from_arrow_refs(refs)
