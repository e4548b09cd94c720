"""Sessionization tests: naive reference, gap edges (exactly at the
threshold), timestamp ties, single-event users, partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mkevents(rows, n_blocks: int = 1):
    """rows: list of (event_id, ts_us, user_id, value)."""
    import ray.data as rd

    e, t, u, v = zip(*rows)
    tbl = pa.table(
        {
            "event_id": pa.array(e, pa.int64()),
            "ts": pa.array(np.asarray(t, dtype="datetime64[us]")),
            "user_id": pa.array(u, pa.int64()),
            "value": pa.array(v, pa.float64()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _naive(rows, gap_s):
    out = {}
    by_user = {}
    for e, t, u, v in sorted(rows, key=lambda r: (r[2], r[1], r[0])):
        by_user.setdefault(u, []).append((t, v))
    for u, evs in by_user.items():
        sid = 0
        prev = None
        for t, v in evs:
            if prev is None or (t - prev) > gap_s * 1_000_000:
                sid += 1
                out[(u, sid)] = [0, t, t, 0]
            rec = out[(u, sid)]
            rec[0] += 1
            rec[2] = t
            rec[3] += round(v * 100)
            prev = t
    return out


MIN = 60 * 1_000_000  # one minute in us
ROWS = [
    # user 1: two sessions (gap of 31 min splits)
    (1, 0 * MIN, 1, 1.00),
    (2, 10 * MIN, 1, 2.50),
    (3, 41 * MIN, 1, 0.25),
    # user 2: gap EXACTLY 30 min -> same session (<= threshold)
    (4, 0 * MIN, 2, 1.00),
    (5, 30 * MIN, 2, 1.00),
    # user 2: next event 30 min + 1 us later -> new session
    (6, 60 * MIN + 1, 2, 4.00),
    # user 3: single event
    (7, 5 * MIN, 3, 9.99),
    # user 4: timestamp tie broken by event_id
    (9, 7 * MIN, 4, 0.10),
    (8, 7 * MIN, 4, 0.20),
]


def test_matches_naive(ray_session):
    from raydedup.stages.sessions import sessionize

    got = sessionize(_mkevents(ROWS), gap_s=1800).to_pandas()
    want = _naive(ROWS, 1800)
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        n, t0, t1, cents = want[(r.user_id, r.session_id)]
        assert r.n_events == n
        assert r.t_start.value == t0 * 1000 or r.t_start.value == t0  # ns vs us
        assert r.sum_value_cents == cents
    # the planted edges
    g = {(r.user_id, r.session_id): r.n_events for r in got.itertuples(index=False)}
    assert g[(1, 1)] == 2 and g[(1, 2)] == 1
    assert g[(2, 1)] == 2 and g[(2, 2)] == 1  # exact-30-min stays together
    assert g[(3, 1)] == 1
    assert g[(4, 1)] == 2


def test_partition_invariance(ray_session):
    from raydedup.stages.sessions import sessionize

    a = sessionize(_mkevents(ROWS), gap_s=1800)
    b = sessionize(_mkevents(ROWS, n_blocks=4), gap_s=1800)
    pa_sort = lambda t: t.to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert pa_sort(a).equals(pa_sort(b))


def test_empty_events(ray_session):
    from raydedup.stages.sessions import sessionize

    out = sessionize(_mkevents(ROWS).filter(lambda r: False), gap_s=1800)
    assert out.count() == 0
