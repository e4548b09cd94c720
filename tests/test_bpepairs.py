"""BPE merge-pair counts: naive reference, degenerate + non-ASCII docs,
partition invariance, min_count/top_k cuts."""

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.stages.bpepairs import _batch_pair_partial, bpe_pair_counts

_BR = {"\x00", "\t", "\n", "\r", " "}


def _naive(texts, min_count=1, top_k=50):
    ref = Counter()
    for s in texts:
        for a, b in zip(s, s[1:]):
            if a not in _BR and b not in _BR:
                ref[(a, b)] += 1
    items = [(k, c) for k, c in ref.items() if c >= min_count]
    items.sort(key=lambda kv: (-kv[1], kv[0]))
    return [(a, b, c) for (a, b), c in items[:top_k]]


def _docs(texts, n_blocks=1):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks)


TEXTS = [
    "the cat sat on the mat",
    "the cathedral was theatrical",
    "héllo wörld — 思考中 héllo",   # non-ASCII pairs
    "",                             # empty
    "x",                            # 1 char: no pairs
    "a\tb\nc\rd e",                 # every pair spans a break: no pairs
    "aa  bb\t\tcc",                 # pairs only within runs
    None,                           # null text
]


def test_partial_matches_naive():
    t = pa.table({"text": pa.array(TEXTS, pa.large_string())})
    part = _batch_pair_partial(t)
    pk = part.column("pk").to_numpy().view(np.uint64)
    cnt = part.column("cnt").to_numpy()
    got = {
        (chr(int(k >> np.uint64(32))), chr(int(k & np.uint64(0xFFFFFFFF)))): int(c)
        for k, c in zip(pk, cnt)
    }
    ref = Counter()
    for s in TEXTS:
        s = s or ""
        for a, b in zip(s, s[1:]):
            if a not in _BR and b not in _BR:
                ref[(a, b)] += 1
    assert got == dict(ref)


def test_pair_counts_e2e(rd_ctx):
    texts = [s or "" for s in TEXTS]
    out = bpe_pair_counts(_docs(texts), min_count=1, top_k=1000)
    got = list(zip(*[out.column(c).to_pylist() for c in ("left", "right", "cnt")]))
    assert got == _naive(texts, 1, 1000)
    # deterministic total order: cnt DESC then codepoint ASC
    assert got == sorted(got, key=lambda r: (-r[2], r[0], r[1]))


def test_partition_invariance_and_cuts(rd_ctx):
    texts = [s or "" for s in TEXTS] * 7
    a = bpe_pair_counts(_docs(texts, 1), min_count=3, top_k=10)
    b = bpe_pair_counts(_docs(texts, 5), min_count=3, top_k=10)
    assert a.to_pydict() == b.to_pydict()
    assert a.num_rows <= 10
    assert all(c >= 3 for c in a.column("cnt").to_pylist())
    assert a.to_pydict()["left"] == [r[0] for r in _naive(texts, 3, 10)]


def test_all_empty(rd_ctx):
    out = bpe_pair_counts(_docs(["", " ", "\n\n"]))
    assert out.num_rows == 0
    assert out.schema.names == ["left", "right", "cnt"]


@pytest.fixture
def rd_ctx(ray_session):
    return ray_session
