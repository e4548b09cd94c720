"""Heavy-hitter tests: exact reference at several capacities,
partition (merge-order) invariance, degenerate docs, non-ASCII."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest


def _exact(texts, capacity: int):
    c: Counter[str] = Counter()
    for t in texts:
        c.update((t or "").lower().split())
    n = sum(c.values())
    return sorted(
        [(w, k) for w, k in c.items() if k * (capacity + 1) > n],
        key=lambda x: (-x[1], x[0]),
    )


def _ds(texts, n_blocks: int = 1):
    import pyarrow as pa
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


@pytest.fixture(scope="module")
def texts():
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(200)]
    probs = np.array([1.0 / (i + 1) ** 1.3 for i in range(200)])
    probs /= probs.sum()
    out = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 50), p=probs))
        for _ in range(300)
    ]
    out += ["", None, "solo", "é ü é é ü"]  # degenerate + non-ASCII
    return out


@pytest.mark.parametrize("capacity", [7, 31, 255, 100_000])
def test_exact_at_capacity(ray_session, texts, capacity):
    from raydedup.stages.heavyhitters import heavy_hitters

    out = heavy_hitters(_ds(texts, 5), capacity=capacity).to_pandas()
    assert list(zip(out.token, out.cnt)) == _exact(texts, capacity)


def test_partition_invariance(ray_session, texts):
    from raydedup.stages.heavyhitters import heavy_hitters

    a = heavy_hitters(_ds(texts, 1), capacity=31).to_pandas()
    b = heavy_hitters(_ds(texts, 11), capacity=31).to_pandas()
    assert a.equals(b)


def test_empty_corpus(ray_session):
    from raydedup.stages.heavyhitters import heavy_hitters

    out = heavy_hitters(_ds(["", None]), capacity=8).to_pandas()
    assert len(out) == 0
