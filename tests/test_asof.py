"""As-of join tests: naive reference on random data, strict-inequality
and tie-break edges, users with no right events, partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mkevents(rows, n_blocks: int = 1):
    """rows: list of (event_id, ts_us, user_id, event_type)."""
    import ray.data as rd

    e, t, u, et = zip(*rows)
    tbl = pa.table(
        {
            "event_id": pa.array(e, pa.int64()),
            "ts": pa.array(np.asarray(t, dtype="datetime64[us]")),
            "user_id": pa.array(u, pa.int64()),
            "event_type": pa.array(et, pa.large_string()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _naive(rows, left_type, right_type):
    """Per left event: right event maximizing (ts, event_id) with
    ts strictly less, same user. Returns {left_eid: (right_eid, lag)}."""
    out = {}
    for le, lt, lu, lty in rows:
        if lty != left_type:
            continue
        best = None
        for re_, rt, ru, rty in rows:
            if rty != right_type or ru != lu or rt >= lt:
                continue
            if best is None or (rt, re_) > best[:2]:
                best = (rt, re_)
        if best is not None:
            out[le] = (best[1], lt - best[0])
    return out


MIN = 60 * 1_000_000

ROWS = [
    # user 1: click then purchase -> match
    (1, 0 * MIN, 1, "click"),
    (2, 5 * MIN, 1, "purchase"),
    # user 1: second purchase matches the SAME click (no consumption)
    (3, 9 * MIN, 1, "purchase"),
    # user 2: click at the SAME microsecond as purchase -> NO match
    (4, 10 * MIN, 2, "click"),
    (5, 10 * MIN, 2, "purchase"),
    # user 3: two clicks at the same ts -> larger event_id wins
    (7, 0 * MIN, 3, "click"),
    (6, 0 * MIN, 3, "click"),
    (8, 1 * MIN, 3, "purchase"),
    # user 4: click only AFTER purchase -> no match
    (9, 20 * MIN, 4, "purchase"),
    (10, 30 * MIN, 4, "click"),
    # user 5: purchase, no clicks at all
    (11, 0 * MIN, 5, "purchase"),
    # noise types are ignored
    (12, 1 * MIN, 1, "view"),
]


def test_planted_edges(ray_session):
    from raydedup.stages.asof import asof_join_events

    got = asof_join_events(_mkevents(ROWS), "purchase", "click").to_pandas()
    m = {r.event_id: (r.matched_event_id, r.lag_us) for r in got.itertuples(index=False)}
    assert m == _naive(ROWS, "purchase", "click")
    assert m[2] == (1, 5 * MIN)
    assert m[3] == (1, 9 * MIN)  # same click matched twice
    assert 5 not in m  # same-ts click excluded (strict <)
    assert m[8] == (7, 1 * MIN)  # same-ts clicks: max event_id wins
    assert 9 not in m and 11 not in m


def test_matches_naive_random(ray_session):
    from raydedup.stages.asof import asof_join_events

    rng = np.random.default_rng(7)
    rows = [
        (
            int(i),
            int(rng.integers(0, 50) * MIN),  # coarse ts -> many ties
            int(rng.integers(1, 20)),
            ["purchase", "click", "view"][int(rng.integers(0, 3))],
        )
        for i in range(400)
    ]
    got = asof_join_events(_mkevents(rows, n_blocks=5), "purchase", "click").to_pandas()
    m = {r.event_id: (r.matched_event_id, r.lag_us) for r in got.itertuples(index=False)}
    assert m == _naive(rows, "purchase", "click")


def test_partition_invariance(ray_session):
    from raydedup.stages.asof import asof_join_events

    srt = lambda ds: (
        ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    )
    a = srt(asof_join_events(_mkevents(ROWS), "purchase", "click"))
    b = srt(asof_join_events(_mkevents(ROWS, n_blocks=6), "purchase", "click"))
    assert a.equals(b)


def test_no_right_events(ray_session):
    from raydedup.stages.asof import asof_join_events

    rows = [(1, 0, 1, "purchase"), (2, MIN, 2, "purchase")]
    out = asof_join_events(_mkevents(rows), "purchase", "click")
    assert out.count() == 0
