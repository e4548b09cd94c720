"""Collocation (bigram lift) tests: naive reference, planted
collocations, non-ASCII routing, degenerate docs, and partition
invariance."""

from __future__ import annotations

import numpy as np
import pytest


def _naive_collocations(texts: list[str], min_count: int, top_k: int):
    """Pure-Python reference: adjacent lowered-token pairs scored by
    lift = (c_xy * N) / (c_x * c_y), ordered (lift DESC, n_pair DESC,
    w1 ASC, w2 ASC), truncated to top_k."""
    from collections import Counter

    uni: Counter[str] = Counter()
    pair: Counter[tuple[str, str]] = Counter()
    for t in texts:
        toks = t.lower().split()
        uni.update(toks)
        pair.update(zip(toks, toks[1:]))
    n = sum(uni.values())
    rows = [
        (a, b, c, float(c * n) / float(uni[a] * uni[b]))
        for (a, b), c in pair.items()
        if c >= min_count
    ]
    rows.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    return rows[:top_k]


def _docs_ds(texts: list[str], n_blocks: int = 1):
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
    vocab = [f"w{i}" for i in range(50)]
    out = []
    for i in range(100):
        body = " ".join(rng.choice(vocab, size=25))
        if i % 3 == 0:  # planted high-lift phrase, 34 occurrences
            body = body + " new york"
        if i % 5 == 0:  # second planted phrase, 20 occurrences
            body = "cookie banner " + body
        out.append(body)
    out.append("solo")  # single token: unigram only, no bigram
    out.append("")  # empty
    out.append("   \t \n ")  # whitespace only
    # non-ASCII docs exercise the per-doc slow path
    for _ in range(6):
        out.append("naïve café naïve café übung")
    return out


def _rows(tbl):
    return list(
        zip(
            tbl.column("w1").to_pylist(),
            tbl.column("w2").to_pylist(),
            tbl.column("n_pair").to_pylist(),
            tbl.column("lift").to_pylist(),
        )
    )


def test_matches_naive_reference(ray_session, texts):
    from raydedup.stages.collocations import collocations

    got = _rows(collocations(_docs_ds(texts), min_count=5, top_k=30))
    want = _naive_collocations(texts, min_count=5, top_k=30)
    assert got == want
    # the planted phrases survive the min_count gate with high lift
    pairs = {(a, b): (c, l) for a, b, c, l in got}
    assert pairs[("new", "york")][0] == 34
    assert pairs[("cookie", "banner")][0] == 20
    # planted phrases outrank random vocab pairs
    assert got[0][0:2] in {("new", "york"), ("cookie", "banner"), ("naïve", "café"), ("café", "naïve"), ("café", "übung")}


def test_non_ascii_slow_path(ray_session, texts):
    from raydedup.stages.collocations import collocations

    got = _rows(collocations(_docs_ds(texts), min_count=5, top_k=50))
    pairs = {(a, b): c for a, b, c, _ in got}
    # 6 docs x 2 occurrences of the adjacent pair (naïve café)
    assert pairs[("naïve", "café")] == 12
    assert pairs[("café", "naïve")] == 6
    assert pairs[("café", "übung")] == 6


def test_min_count_gate_and_empty(ray_session):
    from raydedup.stages.collocations import collocations

    tbl = collocations(_docs_ds(["a b", "a b", "c d"]), min_count=3, top_k=10)
    assert tbl.num_rows == 0
    tbl = collocations(_docs_ds(["", "   "]), min_count=1, top_k=10)
    assert tbl.num_rows == 0


def test_partition_invariance(ray_session, texts):
    from raydedup.stages.collocations import collocations

    a = _rows(collocations(_docs_ds(texts, n_blocks=1), min_count=4, top_k=25))
    b = _rows(collocations(_docs_ds(texts, n_blocks=9), min_count=4, top_k=25))
    assert a == b
