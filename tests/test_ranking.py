"""Global-rank tests: permutation property, naive reference with heavy
ties, ntile edges, partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(ids, vals, n_blocks: int = 1):
    import ray.data as rd

    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "n": pa.array(vals, pa.int64())}
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _naive(ids, vals, k):
    order = sorted(range(len(ids)), key=lambda i: (vals[i], ids[i]))
    n = len(ids)
    out = {}
    for r, i in enumerate(order, 1):
        out[ids[i]] = (r, (k * (r - 1)) // n)
    return out


def test_matches_naive_with_ties(ray_session):
    from raydedup.stages.ranking import global_rank

    rng = np.random.default_rng(5)
    ids = list(range(200))
    vals = [int(v) for v in rng.integers(0, 20, 200)]  # heavy ties
    got = global_rank(_ds(ids, vals, n_blocks=5), "n", "doc_id", ntile=4).to_pandas()
    want = _naive(ids, vals, 4)
    assert len(got) == 200
    for r in got.itertuples(index=False):
        assert want[r.doc_id] == (r.rank, r.tile)
    assert sorted(got["rank"]) == list(range(1, 201))  # exact permutation


def test_ntile_edges(ray_session):
    from raydedup.stages.ranking import global_rank

    got = global_rank(_ds([1, 2, 3, 4], [10, 20, 30, 40]), "n", "doc_id", ntile=4).to_pandas()
    m = dict(zip(got.doc_id, got.tile))
    assert m == {1: 0, 2: 1, 3: 2, 4: 3}


def test_partition_invariance(ray_session):
    from raydedup.stages.ranking import global_rank

    ids = list(range(50))
    vals = [i % 7 for i in ids]
    srt = lambda d: d.to_pandas().sort_values("doc_id").reset_index(drop=True)
    a = global_rank(_ds(ids, vals), "n", "doc_id")
    b = global_rank(_ds(ids, vals, 7), "n", "doc_id")
    assert srt(a).equals(srt(b))
