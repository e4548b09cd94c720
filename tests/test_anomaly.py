"""Grouped z-score anomaly stage: naive reference, degenerate groups,
partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _mkevents(types, values, n_blocks: int = 1):
    ds = rd.from_arrow(
        pa.table(
            {
                "event_id": pa.array(range(len(values)), pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(values, pa.float64()),
            }
        )
    )
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _naive(types, values, z_min):
    out = {}
    cents = np.rint(np.asarray(values) * 100.0).astype(np.int64)
    types = np.asarray(types, dtype=object)
    for g in set(types.tolist()):
        m = types == g
        c = cents[m]
        n = len(c)
        s = int(c.sum())
        ssq = int((c * c).sum())
        num = n * ssq - s * s
        if n < 2 or num <= 0:
            continue
        std = np.sqrt(np.float64(num) / (np.float64(n) * np.float64(n)))
        z = (c.astype(np.float64) - np.float64(s) / np.float64(n)) / std
        ids = np.flatnonzero(m)
        for i, zz in zip(ids, z):
            if abs(zz) >= z_min:
                out[int(i)] = zz
    return out


def test_zscores_match_naive(ray_session):
    from raydedup.stages.anomaly import event_zscores

    rng = np.random.default_rng(7)
    types = rng.choice(["a", "b", "c"], size=200).tolist()
    values = np.round(rng.normal(50, 10, size=200), 2).tolist()
    values[0] = 500.0  # planted outlier
    df = (
        event_zscores(_mkevents(types, values), z_min=2.0)
        .to_pandas()
        .set_index("event_id")
    )
    want = _naive(types, values, 2.0)
    assert sorted(df.index.tolist()) == sorted(want)
    assert 0 in want
    for i, z in want.items():
        assert df.loc[i, "z"] == z  # bit-exact


def test_zscores_degenerate_groups(ray_session):
    from raydedup.stages.anomaly import event_zscores

    # singleton group and zero-variance group emit nothing
    df = event_zscores(
        _mkevents(["solo", "flat", "flat", "flat"], [9.0, 5.0, 5.0, 5.0])
    ).to_pandas()
    assert len(df) == 0


def test_zscores_partition_invariance(ray_session):
    from raydedup.stages.anomaly import event_zscores

    rng = np.random.default_rng(11)
    types = rng.choice(["x", "y"], size=120).tolist()
    values = np.round(rng.normal(10, 3, size=120), 2).tolist()
    a = (
        event_zscores(_mkevents(types, values, 1), z_min=1.5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    b = (
        event_zscores(_mkevents(types, values, 6), z_min=1.5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
