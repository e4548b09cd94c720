"""Rollup tests: naive reference, level consistency (subtotals sum to
the grand total), partition invariance."""

from __future__ import annotations

import pyarrow as pa


def _ds(rows, n_blocks: int = 1):
    import ray.data as rd

    a, b, v = zip(*rows)
    tbl = pa.table(
        {
            "s": pa.array(a, pa.large_string()),
            "p": pa.array(b, pa.large_string()),
            "value": pa.array(v, pa.float64()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


ROWS = [
    ("F", "1-URGENT", 1.00),
    ("F", "1-URGENT", 2.50),
    ("F", "2-HIGH", 0.25),
    ("O", "1-URGENT", 4.00),
    ("O", "3-LOW", 9.99),
]


def test_levels(ray_session):
    from raydedup.stages.rollup import rollup_counts

    got = rollup_counts(_ds(ROWS, 3), "s", "p", "value").to_pandas()
    m = {(r.k1, r.k2): (r.n, r.sum_cents) for r in got.itertuples(index=False)}
    assert m[("F", "1-URGENT")] == (2, 350)
    assert m[("F", "2-HIGH")] == (1, 25)
    assert m[("F", "ALL")] == (3, 375)
    assert m[("O", "ALL")] == (2, 1399)
    assert m[("ALL", "ALL")] == (5, 1774)
    # subtotals are consistent by construction
    assert m[("F", "ALL")][1] + m[("O", "ALL")][1] == m[("ALL", "ALL")][1]
    assert len(m) == 4 + 2 + 1


def test_partition_invariance(ray_session):
    from raydedup.stages.rollup import rollup_counts

    a = rollup_counts(_ds(ROWS), "s", "p", "value")
    b = rollup_counts(_ds(ROWS, 5), "s", "p", "value")
    assert a.equals(b)
