"""Windowed range-join tests: naive reference on tie-heavy random data,
boundary semantics ([ts-W, ts): closed low, strict high), partition
invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mkevents(rows, n_blocks: int = 1):
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


def _naive(rows, left_type, right_type, w_us):
    out = {}
    for le, lt, lu, lty in rows:
        if lty != left_type:
            continue
        out[le] = sum(
            1
            for _, rt, ru, rty in rows
            if rty == right_type and ru == lu and lt - w_us <= rt < lt
        )
    return out


MIN = 60 * 1_000_000
W = 30 * MIN

ROWS = [
    # user 1: views at -31, -30, -1, 0 min relative to the purchase
    (1, 0 * MIN, 1, "view"),       # exactly ts - W -> counted (closed)
    (2, 1 * MIN, 1, "view"),
    (3, 29 * MIN, 1, "view"),
    (4, 30 * MIN, 1, "view"),      # same microsecond as purchase -> NOT counted
    (5, 30 * MIN, 1, "purchase"),
    # user 1, later purchase: window slides
    (6, 61 * MIN, 1, "purchase"),
    # user 2: view belongs to another user
    (7, 10 * MIN, 2, "view"),
    (8, 20 * MIN, 3, "purchase"),  # no views at all -> 0
    (9, 5 * MIN, 1, "error"),      # other types ignored
]


def test_boundaries(ray_session):
    from raydedup.stages.rangejoin import window_count_join

    got = window_count_join(_mkevents(ROWS), "purchase", "view", window_s=1800).to_pandas()
    m = dict(zip(got.event_id, got.n_in_window))
    assert m == _naive(ROWS, "purchase", "view", W)
    assert m[5] == 3  # views at 0, 1, 29 min; the same-microsecond one excluded
    assert m[6] == 0  # window [31, 61): the 30-min view is outside (closed low bound)
    assert m[8] == 0


def test_matches_naive_random(ray_session):
    from raydedup.stages.rangejoin import window_count_join

    rng = np.random.default_rng(3)
    rows = [
        (
            int(i),
            int(rng.integers(0, 100) * MIN),
            int(rng.integers(1, 12)),
            ["purchase", "view", "click"][int(rng.integers(0, 3))],
        )
        for i in range(500)
    ]
    got = window_count_join(
        _mkevents(rows, n_blocks=6), "purchase", "view", window_s=1800
    ).to_pandas()
    m = dict(zip(got.event_id, got.n_in_window))
    assert m == _naive(rows, "purchase", "view", W)


def test_partition_invariance(ray_session):
    from raydedup.stages.rangejoin import window_count_join

    srt = lambda ds: ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    a = srt(window_count_join(_mkevents(ROWS), "purchase", "view"))
    b = srt(window_count_join(_mkevents(ROWS, n_blocks=5), "purchase", "view"))
    assert a.equals(b)
