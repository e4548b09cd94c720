"""Hot-passage (boilerplate k-gram) detection tests: naive reference,
planted boilerplate, non-ASCII routing, short docs, partition
invariance, and the limit/top ordering."""

from __future__ import annotations

import numpy as np
import pytest


def _naive_hot(texts: list[str], min_docs: int, k: int) -> dict[str, int]:
    """Pure-Python reference: lowered word k-grams -> distinct-doc count."""
    from collections import Counter

    c: Counter[str] = Counter()
    for t in texts:
        words = t.lower().split()
        grams = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
        c.update(grams)
    return {g: n for g, n in c.items() if n >= min_docs}


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


BOILER = "subscribe to our newsletter for updates"  # 6 words -> two 5-grams


@pytest.fixture(scope="module")
def texts():
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(40)]
    out = []
    for i in range(120):
        body = " ".join(rng.choice(vocab, size=30))
        if i % 4 == 0:  # 30 docs carry the planted boilerplate
            body = body + " " + BOILER
        out.append(body)
    out.append("tiny doc")  # < k tokens: contributes nothing
    out.append("")  # empty
    out.append("naïve café exposé unicode répétition boilerplate übung")  # non-ASCII
    out.append("naïve café exposé unicode répétition boilerplate übung extra")
    out.append("naïve café exposé unicode répétition boilerplate übung other")
    return out


def test_matches_naive_reference(ray_session, texts):
    from raydedup.stages.passages import hot_passages

    got = hot_passages(_docs_ds(texts), min_docs=3, k=5)
    want = _naive_hot(texts, min_docs=3, k=5)
    got_map = dict(zip(got.column("shingle").to_pylist(), got.column("n_docs").to_pylist()))
    assert got_map == want
    # the planted boilerplate 5-grams are present with the planted count
    assert got_map["subscribe to our newsletter for"] == 30
    assert got_map["to our newsletter for updates"] == 30
    # the non-ASCII shared prefix k-grams were counted via the slow path
    assert got_map["naïve café exposé unicode répétition"] == 3


def test_partition_invariance(ray_session, texts):
    from raydedup.stages.passages import hot_passages

    a = hot_passages(_docs_ds(texts, n_blocks=1), min_docs=2, k=5)
    b = hot_passages(_docs_ds(texts, n_blocks=7), min_docs=2, k=5)
    am = dict(zip(a.column("shingle").to_pylist(), a.column("n_docs").to_pylist()))
    bm = dict(zip(b.column("shingle").to_pylist(), b.column("n_docs").to_pylist()))
    assert am == bm


def test_empty_and_no_hot(ray_session):
    from raydedup.stages.passages import hot_passages

    out = hot_passages(_docs_ds(["one two three four five six"]), min_docs=2, k=5)
    assert out.num_rows == 0
    assert out.schema.names == ["shingle", "n_docs"]


def test_limit_orders_by_count_then_shingle(ray_session, texts):
    from raydedup.stages.passages import hot_passages

    full = hot_passages(_docs_ds(texts), min_docs=2, k=5)
    top = hot_passages(_docs_ds(texts), min_docs=2, k=5, limit=3)
    assert top.num_rows == 3
    n = full.column("n_docs").to_pylist()
    s = full.column("shingle").to_pylist()
    order = sorted(range(len(n)), key=lambda i: (-n[i], s[i]))
    assert top.column("shingle").to_pylist() == [s[i] for i in order[:3]]
    assert top.column("n_docs").to_pylist() == [n[i] for i in order[:3]]
