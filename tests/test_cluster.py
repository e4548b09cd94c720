"""Union-find backends: driver, actor-pool, and label-propagation must
produce identical components (graft extension; no reference analog —
Panako emits pairs only, ``cli/Deduplication.java:90-108``)."""

import numpy as np
import pandas as pd
import pytest

from raydedup.stages.cluster import (
    UnionFind,
    cluster_pairs_actors,
    cluster_pairs_driver,
)


def _rand_edges(n_nodes=500, n_edges=800, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    a = rng.integers(0, n_nodes, size=n_edges, dtype=np.int64)
    b = rng.integers(0, n_nodes, size=n_edges, dtype=np.int64)
    m = a != b
    return pd.DataFrame({"a": a[m], "b": b[m]})


def _canon(components: dict[int, int]) -> dict[int, int]:
    return dict(sorted(components.items()))


def test_unionfind_basic():
    uf = UnionFind()
    uf.union(1, 2)
    uf.union(2, 3)
    uf.union(10, 11)
    assert uf.find(3) == 1
    assert uf.find(11) == 10
    comp = uf.components()
    assert comp[3] == 1 and comp[2] == 1 and comp[11] == 10


def test_root_is_min_member():
    uf = UnionFind()
    uf.union(5, 9)
    uf.union(9, 2)
    uf.union(7, 2)
    assert all(r == 2 for r in (uf.find(5), uf.find(9), uf.find(7)))


def _brute_components(df: pd.DataFrame) -> dict[int, int]:
    uf = UnionFind()
    for a, b in zip(df["a"], df["b"]):
        uf.union(int(a), int(b))
    return uf.components()


def test_driver_matches_bruteforce():
    df = _rand_edges()
    assert _canon(cluster_pairs_driver(df)) == _canon(_brute_components(df))


def test_actor_backend_matches_driver(ray_session):
    df = _rand_edges(n_nodes=2000, n_edges=3000, seed=9)
    got = cluster_pairs_actors(df, n_shards=4, final_threshold=100)
    assert _canon(got) == _canon(_brute_components(df))


def test_actor_backend_chain_topology(ray_session):
    # worst case for contraction: one long chain across shards
    n = 500
    df = pd.DataFrame(
        {"a": np.arange(n - 1, dtype=np.int64), "b": np.arange(1, n, dtype=np.int64)}
    )
    got = cluster_pairs_actors(df, n_shards=4, final_threshold=10)
    assert set(got.values()) == {0}
    assert len(got) == n - 1 or len(got) == n  # root maps to itself optionally
