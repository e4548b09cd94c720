"""Pivot tests: naive reference, other-bucket routing, partition
invariance, empty input."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(rows, n_blocks: int = 1):
    import ray.data as rd

    u, et = zip(*rows)
    tbl = pa.table(
        {"user_id": pa.array(u, pa.int64()), "event_type": pa.array(et, pa.large_string())}
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


ROWS = [
    (1, "view"), (1, "view"), (1, "click"), (1, "weird"),
    (2, "purchase"), (2, "view"),
    (3, "signup"),
]
CATS = ["view", "click", "purchase"]


def _naive():
    out = {}
    for u, et in ROWS:
        r = out.setdefault(u, {c: 0 for c in CATS} | {"other": 0, "total": 0})
        r[et if et in CATS else "other"] += 1
        r["total"] += 1
    return out


def test_pivot_counts(ray_session):
    from raydedup.stages.pivot import pivot_counts

    got = pivot_counts(_ds(ROWS), "user_id", "event_type", CATS).to_pandas()
    want = _naive()
    assert len(got) == len(want)
    for r in got.itertuples(index=False):
        w = want[r.user_id]
        assert (r.n_view, r.n_click, r.n_purchase, r.n_other, r.n_total) == (
            w["view"], w["click"], w["purchase"], w["other"], w["total"]
        )


def test_pivot_partition_invariance(ray_session):
    from raydedup.stages.pivot import pivot_counts

    srt = lambda d: d.to_pandas().sort_values("user_id").reset_index(drop=True)
    a = pivot_counts(_ds(ROWS), "user_id", "event_type", CATS)
    b = pivot_counts(_ds(ROWS, 4), "user_id", "event_type", CATS)
    assert srt(a).equals(srt(b))


def test_pivot_empty(ray_session):
    from raydedup.stages.pivot import pivot_counts

    empty = _ds(ROWS).filter(lambda r: False)
    out = pivot_counts(empty, "user_id", "event_type", CATS)
    assert out.count() == 0
