"""Exact-quantile stage tests: naive reference, grouped variant,
integer-rank edges (pct 0/100, ties), and partition invariance."""

from __future__ import annotations

import numpy as np


def _naive(vals: list[int], pcts) -> dict[int, int]:
    v = np.sort(np.asarray(vals, dtype=np.int64))
    n = v.shape[0]
    out = {}
    for p in pcts:
        rank = max((p * n + 99) // 100, 1)
        out[p] = int(v[rank - 1])
    return out


def _ds(rows: dict, n_blocks: int = 1):
    import pyarrow as pa
    import ray.data as rd

    ds = rd.from_arrow(pa.table(rows))
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def test_matches_naive(ray_session):
    from raydedup.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 300, size=5000).tolist()
    pcts = (0, 25, 50, 90, 99, 100)
    tbl = exact_quantiles(_ds({"x": vals}, n_blocks=6), "x", pcts)
    got = dict(zip(tbl.column("pct").to_pylist(), tbl.column("value").to_pylist()))
    assert got == _naive(vals, pcts)
    assert got[100] == max(vals) and got[0] == min(vals)


def test_grouped_matches_naive(ray_session):
    from raydedup.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(12)
    langs = rng.choice(["en", "de", "fr"], size=3000).tolist()
    vals = rng.integers(0, 100, size=3000).tolist()
    tbl = exact_quantiles(
        _ds({"lang": langs, "x": vals}, n_blocks=5), "x", (50, 90), by="lang"
    )
    rows = list(
        zip(
            tbl.column("lang").to_pylist(),
            tbl.column("pct").to_pylist(),
            tbl.column("value").to_pylist(),
        )
    )
    for g in ("en", "de", "fr"):
        sub = [v for l, v in zip(langs, vals) if l == g]
        want = _naive(sub, (50, 90))
        for p in (50, 90):
            assert (g, p, want[p]) in rows
    # output ordered by (group, pct)
    assert rows == sorted(rows, key=lambda r: (r[0], r[1]))


def test_ties_and_partition_invariance(ray_session):
    from raydedup.stages.quantiles import exact_quantiles

    vals = [5] * 98 + [7, 9]  # p99 rank=99 -> 7, p100 -> 9, p50 -> 5
    a = exact_quantiles(_ds({"x": vals}), "x", (50, 99, 100))
    b = exact_quantiles(_ds({"x": vals}, n_blocks=7), "x", (50, 99, 100))
    assert a.equals(b)
    got = dict(zip(a.column("pct").to_pylist(), a.column("value").to_pylist()))
    assert got == {50: 5, 99: 7, 100: 9}
