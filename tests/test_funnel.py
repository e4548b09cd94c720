"""Funnel tests: naive reference, strict-after semantics (ties don't
advance), out-of-order events, repeated step types, partition
invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mkevents(rows, n_blocks: int = 1):
    """rows: (user_id, ts_us, event_type)."""
    import ray.data as rd

    u, t, et = zip(*rows)
    tbl = pa.table(
        {
            "user_id": pa.array(u, pa.int64()),
            "ts": pa.array(np.asarray(t, dtype="datetime64[us]")),
            "event_type": pa.array(et, pa.large_string()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _naive(rows, steps):
    by_user = {}
    for u, t, et in rows:
        by_user.setdefault(u, []).append((t, et))
    counts = [0] * len(steps)
    for u, evs in by_user.items():
        evs.sort()
        prev = -float("inf")
        for i, s in enumerate(steps):
            nxt = min((t for t, et in evs if et == s and t > prev), default=None)
            if nxt is None:
                break
            counts[i] += 1
            prev = nxt
    return counts


ROWS = [
    (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),  # full funnel
    (2, 10, "view"), (2, 20, "click"),                        # stops at click
    (3, 10, "click"), (3, 20, "view"),                        # wrong order
    (4, 10, "view"), (4, 10, "click"),                        # tie: click NOT after view
    (5, 10, "purchase"), (5, 20, "view"), (5, 30, "click"), (5, 40, "purchase"),
    (6, 10, "error"),                                          # never enters
]
STEPS = ["view", "click", "purchase"]


def test_matches_naive(ray_session):
    from raydedup.stages.funnel import funnel

    got = funnel(_mkevents(ROWS), STEPS)
    assert got.column("n_users").to_pylist() == _naive(ROWS, STEPS)
    # planted expectations: views {1,2,3,4,5}=5; clicks after view
    # {1,2,5} (3 wrong order, 4 tie); purchases {1,5}
    assert got.column("n_users").to_pylist() == [5, 3, 2]
    assert got.column("event_type").to_pylist() == STEPS


def test_repeated_step_type(ray_session):
    from raydedup.stages.funnel import funnel

    rows = [(1, 10, "click"), (1, 20, "click"), (2, 10, "click")]
    got = funnel(_mkevents(rows), ["click", "click"])
    assert got.column("n_users").to_pylist() == [2, 1]


def test_partition_invariance(ray_session):
    from raydedup.stages.funnel import funnel

    a = funnel(_mkevents(ROWS), STEPS)
    b = funnel(_mkevents(ROWS, n_blocks=5), STEPS)
    assert a.equals(b)
