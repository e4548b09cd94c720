"""Cohort-retention tests: naive reference, cross-period users,
single-event users, partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

WEEK = 7 * 86400 * 1_000_000


def _mkevents(rows, n_blocks: int = 1):
    """rows: (user_id, ts_us)."""
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


def _naive(rows):
    from collections import defaultdict

    per_user = defaultdict(set)
    for u, t in rows:
        per_user[u].add(t // WEEK)
    cells = defaultdict(int)
    for u, pers in per_user.items():
        cohort = min(pers)
        for p in pers:
            cells[(cohort, p - cohort)] += 1
    return dict(cells)


ROWS = [
    (1, 0), (1, WEEK + 5), (1, 3 * WEEK),      # cohort 0, k 0/1/3
    (2, WEEK), (2, WEEK + 10),                  # cohort 1, k 0 (same week twice)
    (3, 0), (3, WEEK - 1),                      # cohort 0, k 0 only (same week)
    (4, 2 * WEEK),                              # cohort 2, single event
]


def test_matches_naive(ray_session):
    from raydedup.stages.retention import retention

    got = retention(_mkevents(ROWS))
    cells = {
        (c, k): n
        for c, k, n in zip(
            got.column("cohort").to_pylist(),
            got.column("k").to_pylist(),
            got.column("n_users").to_pylist(),
        )
    }
    assert cells == _naive(ROWS)
    assert cells[(0, 0)] == 2 and cells[(0, 1)] == 1 and cells[(0, 3)] == 1
    assert cells[(1, 0)] == 1 and cells[(2, 0)] == 1
    # output sorted by (cohort, k)
    pairs = list(zip(got.column("cohort").to_pylist(), got.column("k").to_pylist()))
    assert pairs == sorted(pairs)


def test_partition_invariance_and_empty(ray_session):
    from raydedup.stages.retention import retention

    a = retention(_mkevents(ROWS))
    b = retention(_mkevents(ROWS, n_blocks=4))
    assert a.equals(b)
    empty = retention(_mkevents(ROWS).filter(lambda r: False))
    assert empty.num_rows == 0 and empty.schema.names == ["cohort", "k", "n_users"]


def test_small_period_large_offsets(ray_session):
    """period_s=1 over multi-day spans produces offsets far beyond any
    packing assumption — counts must stay exact (regression for the
    former 20-bit (cohort,k) bit-pack)."""
    from raydedup.stages.retention import retention

    SEC = 1_000_000
    rows = [(1, 0), (1, (1 << 21) * SEC), (2, 5 * SEC)]
    got = retention(_mkevents(rows), period_s=1)
    cells = {
        (c, k): n
        for c, k, n in zip(
            got.column("cohort").to_pylist(),
            got.column("k").to_pylist(),
            got.column("n_users").to_pylist(),
        )
    }
    assert cells == {(0, 0): 1, (0, 1 << 21): 1, (5, 0): 1}
