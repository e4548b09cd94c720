"""Star-join revenue tests: naive reference on synthetic tables,
orders without lineitems, partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _tables():
    nation = pa.table(
        {
            "n_nationkey": pa.array([0, 1, 2], pa.int64()),
            "n_name": pa.array(["ALPHA", "BETA", "GAMMA"], pa.large_string()),
        }
    )
    customer = pa.table(
        {
            "c_custkey": pa.array([10, 11, 12, 13], pa.int64()),
            "c_nationkey": pa.array([0, 1, 1, 2], pa.int64()),
        }
    )
    orders = pa.table(
        {
            "o_orderkey": pa.array([100, 101, 102, 103], pa.int64()),
            "o_custkey": pa.array([10, 11, 12, 13], pa.int64()),
        }
    )
    lineitem = pa.table(
        {
            "l_orderkey": pa.array([100, 100, 101, 102, 103], pa.int64()),
            "l_extendedprice": pa.array([10.00, 20.00, 5.50, 1.25, 100.00], pa.float64()),
            "l_discount": pa.array([0.10, 0.00, 0.05, 0.00, 0.02], pa.float64()),
        }
    )
    return lineitem, orders, customer, nation


def _naive(lineitem, orders, customer, nation):
    o2c = dict(zip(orders.column("o_orderkey").to_pylist(), orders.column("o_custkey").to_pylist()))
    c2n = dict(zip(customer.column("c_custkey").to_pylist(), customer.column("c_nationkey").to_pylist()))
    n2name = dict(zip(nation.column("n_nationkey").to_pylist(), nation.column("n_name").to_pylist()))
    rev, cnt = {}, {}
    for ok, p, d in zip(
        lineitem.column("l_orderkey").to_pylist(),
        lineitem.column("l_extendedprice").to_pylist(),
        lineitem.column("l_discount").to_pylist(),
    ):
        name = n2name[c2n[o2c[ok]]]
        rev[name] = rev.get(name, 0) + round(p * 100) * (100 - round(d * 100))
        cnt[name] = cnt.get(name, 0) + 1
    return rev, cnt


def test_matches_naive(ray_session):
    from raydedup.stages.relational import revenue_by_nation

    li, od, cu, na = _tables()
    got = revenue_by_nation(
        rd.from_arrow(li).repartition(3),
        rd.from_arrow(od).repartition(2),
        rd.from_arrow(cu),
        rd.from_arrow(na),
    )
    rev, cnt = _naive(li, od, cu, na)
    names = got.column("n_name").to_pylist()
    assert names == sorted(rev)
    for n, r, c in zip(
        names, got.column("revenue_cc").to_pylist(), got.column("n_items").to_pylist()
    ):
        assert (r, c) == (rev[n], cnt[n]), n
    # planted: ALPHA = order 100 = 10.00@10% + 20.00@0% = 900*... check
    m = dict(zip(names, got.column("revenue_cc").to_pylist()))
    assert m["ALPHA"] == 1000 * 90 + 2000 * 100


def test_partition_invariance(ray_session):
    from raydedup.stages.relational import revenue_by_nation

    li, od, cu, na = _tables()
    a = revenue_by_nation(rd.from_arrow(li), rd.from_arrow(od), rd.from_arrow(cu), rd.from_arrow(na))
    b = revenue_by_nation(
        rd.from_arrow(li).repartition(5),
        rd.from_arrow(od).repartition(4),
        rd.from_arrow(cu).repartition(2),
        rd.from_arrow(na),
    )
    assert a.equals(b)
