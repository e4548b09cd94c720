"""Rolling-active-users tests: naive reference, window=1 (DAU),
cross-bucket user split impossibility (user-keyed), partition
invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

DAY = 86_400_000_000


def _mkevents(rows, n_blocks: int = 1):
    import ray.data as rd

    u, t = zip(*rows)
    tbl = pa.table(
        {
            "user_id": pa.array(u, pa.int64()),
            "ts": pa.array(np.asarray(t, dtype="datetime64[us]")),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _naive(rows, window):
    act = {(u, t // DAY) for u, t in rows}
    days = sorted({d for _, d in act})
    out = {}
    for D in days:
        out[D] = len({u for u, d in act if D - window + 1 <= d <= D})
    return out


ROWS = [
    (1, 0), (1, 0 + 5), (1, 3 * DAY),       # user 1: days 0, 3
    (2, 1 * DAY), (2, 8 * DAY),             # user 2: days 1, 8
    (3, 0), (3, 6 * DAY),                   # user 3: days 0, 6
    (4, 20 * DAY),                          # user 4: isolated day 20
]


def test_matches_naive(ray_session):
    from raydedup.stages.active_users import rolling_active_users

    for window in (1, 7):
        got = rolling_active_users(_mkevents(ROWS), window=window)
        m = dict(
            zip(got.column("d").to_pylist(), got.column("n_users").to_pylist())
        )
        assert m == _naive([(u, t) for u, t in ROWS], window), window
    # planted: day 6 within 7-day window of day-0 activity (users 1,3)
    got = rolling_active_users(_mkevents(ROWS), window=7)
    m = dict(zip(got.column("d").to_pylist(), got.column("n_users").to_pylist()))
    assert m[6] == 3  # users 1,3 (day 0 still in window) + 2 (day 1)
    assert m[20] == 1
    ds = got.column("d").to_pylist()
    assert ds == sorted(ds)


def test_partition_invariance_and_validation(ray_session):
    import pytest

    from raydedup.stages.active_users import rolling_active_users

    a = rolling_active_users(_mkevents(ROWS), window=7)
    b = rolling_active_users(_mkevents(ROWS, n_blocks=5), window=7)
    assert a.equals(b)
    with pytest.raises(ValueError):
        rolling_active_users(_mkevents(ROWS), window=0)
