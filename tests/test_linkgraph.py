"""PageRank over a host link graph: naive integer reference, duplicate
edges / self-loops, path equivalence (driver vs distributed), partition
invariance."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.stages.linkgraph import pagerank

SCALE = 10**9


def naive_pagerank(edges, iters=4, scale=SCALE, dn=85, dd=100):
    """Pure-Python ints over distinct edges (self-loops dropped)."""
    es = sorted({(a, b) for a, b in edges if a != b})
    nodes = sorted({a for a, _ in es} | {b for _, b in es})
    outdeg = {}
    for a, _ in es:
        outdeg[a] = outdeg.get(a, 0) + 1
    base = (dd - dn) * scale // dd
    r = {n: scale for n in nodes}
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for a, b in es:
            s[b] += r[a] // outdeg[a]
        r = {n: base + (dn * s[n]) // dd for n in nodes}
    return r


def _edges_ds(edges, blocks=3):
    a = [e[0] for e in edges]
    b = [e[1] for e in edges]
    t = pa.table({"src": pa.array(a, pa.int64()), "dst": pa.array(b, pa.int64())})
    return rd.from_arrow(t).repartition(blocks)


def _check(edges, **kw):
    ref = naive_pagerank(edges)
    got = pagerank(_edges_ds(edges), **kw).to_pandas().sort_values("node")
    assert list(got["node"]) == sorted(ref)
    assert {int(n): int(v) for n, v in zip(got["node"], got["rank"])} == ref
    return got


def test_small_graph_matches_naive():
    edges = [(0, 1), (1, 2), (2, 0), (2, 1), (3, 0), (0, 3)]
    _check(edges)


def test_duplicates_and_self_loops_ignored():
    edges = [(0, 1), (0, 1), (1, 1), (1, 0), (2, 2)]
    ref = naive_pagerank(edges)
    got = pagerank(_edges_ds(edges)).to_pandas()
    assert {int(n): int(v) for n, v in zip(got["node"], got["rank"])} == ref


def test_random_graph_both_paths_and_partitions():
    rng = np.random.default_rng(7)
    edges = list(zip(rng.integers(0, 60, 800).tolist(), rng.integers(0, 60, 800).tolist()))
    ref = naive_pagerank(edges)
    for blocks in (1, 7):
        for cap in (2_000_000, 0):  # driver path / forced distributed path
            got = pagerank(_edges_ds(edges, blocks), edge_cap=cap).to_pandas()
            assert {int(n): int(v) for n, v in zip(got["node"], got["rank"])} == ref


def test_dangling_nodes_and_sinks():
    # node 5 is a pure sink (no out-edges): appears in output, leaks mass
    edges = [(0, 5), (1, 5), (0, 1)]
    got = _check(edges)
    assert 5 in set(got["node"])


def test_empty_edges():
    ds = rd.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    out = pagerank(ds)
    # Ray 2.49 drops columns when an all-empty Dataset crosses
    # to_pandas; queries re-seed from the typed schema driver-side
    assert out.count() == 0
    assert list(out.schema().names) == ["node", "rank"]


def test_negative_node_ids():
    edges = [(-3, 4), (4, -3), (-3, -7)]
    _check(edges, edge_cap=0)
