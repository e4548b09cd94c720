"""Prefix-filter join tests: losslessness vs the naive all-pairs
Jaccard join, threshold edges, hot-run drop accounting, partition
invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mkdocs(rows, n_blocks: int = 1):
    import ray.data as rd

    ids, texts = zip(*rows)
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.large_string())}
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _naive_pairs(rows, tau):
    from raydedup.config import DedupConfig
    from raydedup.stages.signatures import shingle_hashes
    from raydedup.stages.verify import jaccard_sorted

    cfg = DedupConfig()
    sets = {i: shingle_hashes(t, cfg) for i, t in rows}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            j = jaccard_sorted(sets[ids[x]], sets[ids[y]])
            if j >= tau:
                out[(ids[x], ids[y])] = j
    return out


def _sentence(seed: int, n: int = 30) -> str:
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    return " ".join(words[i] for i in rng.integers(0, len(words), n))


ROWS = [
    (1, _sentence(1)),
    (2, _sentence(1)),  # exact dup of 1 -> jaccard 1.0
    (3, _sentence(1) + " " + _sentence(99, 10)),  # near dup of 1
    (4, _sentence(2)),
    (5, _sentence(3)),
    (6, _sentence(2) + " " + _sentence(3)),  # shares with both 4 and 5
    (7, "short text under five"),  # < k words -> fallback single hash
    (8, _sentence(50)),
]


def test_matches_naive(ray_session):
    from raydedup.stages.ppjoin import prefix_filter_pairs

    got, metrics = prefix_filter_pairs(_mkdocs(ROWS), tau=0.5)
    want = _naive_pairs(ROWS, 0.5)
    g = {
        (int(a), int(b)): float(j)
        for a, b, j in zip(got["a"].to_pylist(), got["b"].to_pylist(), got["jaccard"].to_pylist())
    }
    assert g == want  # bit-exact jaccard, identical pair set
    assert (1, 2) in g and g[(1, 2)] == 1.0
    assert metrics["dropped_runs"] == 0


def test_threshold_sweep(ray_session):
    from raydedup.stages.ppjoin import prefix_filter_pairs

    for tau in (0.2, 0.35, 0.8):
        got, _ = prefix_filter_pairs(_mkdocs(ROWS), tau=tau)
        want = _naive_pairs(ROWS, tau)
        g = {
            (int(a), int(b)): float(j)
            for a, b, j in zip(
                got["a"].to_pylist(), got["b"].to_pylist(), got["jaccard"].to_pylist()
            )
        }
        assert g == want, f"tau={tau}"


def test_random_corpus_lossless(ray_session):
    from raydedup.stages.ppjoin import prefix_filter_pairs

    rng = np.random.default_rng(11)
    rows = []
    base = [_sentence(100 + i) for i in range(10)]
    for i in range(60):
        # splice two base sentences -> plenty of genuine overlap
        a, b = rng.integers(0, 10, 2)
        cut = int(rng.integers(5, 25))
        rows.append((i, " ".join(base[a].split()[:cut] + base[b].split()[cut:])))
    got, metrics = prefix_filter_pairs(_mkdocs(rows, n_blocks=4), tau=0.5)
    want = _naive_pairs(rows, 0.5)
    g = {
        (int(a), int(b)): float(j)
        for a, b, j in zip(got["a"].to_pylist(), got["b"].to_pylist(), got["jaccard"].to_pylist())
    }
    assert g == want
    assert metrics["dropped_runs"] == 0
    assert len(want) > 0  # the corpus actually contains matches


def test_partition_invariance(ray_session):
    from raydedup.stages.ppjoin import prefix_filter_pairs

    a, _ = prefix_filter_pairs(_mkdocs(ROWS), tau=0.5)
    b, _ = prefix_filter_pairs(_mkdocs(ROWS, n_blocks=6), tau=0.5)
    assert a.equals(b)


def test_hot_run_drop_accounting(ray_session):
    from raydedup.stages.ppjoin import prefix_filter_pairs

    # every doc identical -> every prefix hash is one giant run
    rows = [(i, _sentence(7)) for i in range(10)]
    got, metrics = prefix_filter_pairs(_mkdocs(rows), tau=0.5, max_run_postings=2)
    assert metrics["dropped_runs"] > 0
    assert got.num_rows == 0  # all runs above the cap -> no silent result
    full, m2 = prefix_filter_pairs(_mkdocs(rows), tau=0.5)
    assert m2["dropped_runs"] == 0
    assert full.num_rows == 45  # all 10-choose-2 identical pairs


def test_prefix_filter_empty_docs(ray_session):
    # ADVICE r2: fully-empty docs must yield a typed empty pair table,
    # not a KeyError from the exchange's 0-column empty fallback
    from raydedup.stages.ppjoin import prefix_filter_pairs

    pairs, metrics = prefix_filter_pairs(_mkdocs([(0, "x")]).filter(lambda r: False))
    assert pairs.num_rows == 0
    assert metrics["dropped_runs"] == 0
