"""Crawl-snapshot diff (stages/crawldiff.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raydedup.stages.crawldiff import crawl_diff


def _sides():
    old = pa.table(
        {
            "url": pa.array(["a", "b", "c", "c", "e"]),
            "digest": pa.array([1, 2, 3, 0, 5], pa.int64()),
        }
    )
    new = pa.table(
        {
            "url": pa.array(["b", "c", "d", "e"]),
            "digest": pa.array([2, 9, 4, 5], pa.int64()),
        }
    )
    return old, new


def test_all_four_statuses(ray_session):
    old, new = _sides()
    got = (
        crawl_diff(rd.from_arrow(old), rd.from_arrow(new))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "url": ["a", "b", "c", "d", "e"],
            "status": ["removed", "unchanged", "changed", "added", "unchanged"],
            # duplicate 'c' in old resolves to MIN digest 0
            "old_digest": [1.0, 2.0, 0.0, np.nan, 5.0],
            "new_digest": [np.nan, 2.0, 9.0, 4.0, 5.0],
        }
    )
    pd.testing.assert_frame_equal(got, want)


def test_empty_sides(ray_session):
    old, new = _sides()
    empty = pa.table(
        {"url": pa.array([], pa.string()), "digest": pa.array([], pa.int64())}
    )
    added = (
        crawl_diff(rd.from_arrow(empty), rd.from_arrow(new)).to_pandas()
    )
    assert set(added.status) == {"added"} and len(added) == 4
    removed = (
        crawl_diff(rd.from_arrow(old), rd.from_arrow(empty)).to_pandas()
    )
    assert set(removed.status) == {"removed"} and len(removed) == 4  # c deduped
    both = crawl_diff(rd.from_arrow(empty), rd.from_arrow(empty))
    assert both.schema().names == ["url", "status", "old_digest", "new_digest"]
    assert len(both.to_pandas()) == 0


def test_partition_invariance(ray_session):
    n = 2000
    ids = np.arange(n, dtype=np.int64)
    old = pa.table(
        {
            "url": pa.array([f"u{i % 300}" for i in ids]),
            "digest": pa.array(ids * 17 % 1009, pa.int64()),
        }
    )
    new = pa.table(
        {
            "url": pa.array([f"u{i % 300 + (i % 2) * 150}" for i in ids]),
            "digest": pa.array(ids * 17 % 1009 + (ids % 5 == 0), pa.int64()),
        }
    )
    a = (
        crawl_diff(rd.from_arrow(old), rd.from_arrow(new))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    b = (
        crawl_diff(
            rd.from_arrow(old).repartition(11), rd.from_arrow(new).repartition(3)
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # union: old u0..u299 plus new-only odd u301..u449 (75 urls)
    assert len(a) == 375
