"""Bloom-prefiltered cross-corpus anti-join: naive reference, forced
false positives (exactness must not depend on bloom quality), the
above-cap no-bloom fallback, degenerate sides, and the span hash."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.hashing import POLY_B, U64, hash_pair_u64, span_hash_u64
from raydedup.stages.bloom import unseen_docs


def _mk(texts: list[str], base: int = 0) -> "rd.Dataset":
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": np.arange(base, base + len(texts), dtype=np.int64),
                "text": texts,
            }
        )
    )


def _corpora(seed: int = 5):
    rng = np.random.default_rng(seed)
    words = ["aa", "bb", "cc", "dd", "ee", "ff"]
    seen = [" ".join(rng.choice(words, 40).tolist()) for _ in range(300)]
    new = [" ".join(rng.choice(words, 40).tolist()) for _ in range(200)]
    for i in range(0, 200, 7):
        new[i] = seen[(i * 3) % 300]
    return seen, new


def _expected(seen: list[str], new: list[str], base: int = 1000) -> list[int]:
    sset = set(seen)
    return [base + i for i, t in enumerate(new) if t not in sset]


def test_matches_naive_reference(ray_session):
    seen, new = _corpora()
    out, m = unseen_docs(_mk(new, 1000).repartition(4), _mk(seen).repartition(5))
    df = out.to_pandas().sort_values("doc_id")
    assert df.doc_id.tolist() == _expected(seen, new)
    assert list(df.columns) == ["doc_id", "text"]
    assert m["dups_dropped"] + m["false_positives"] == m["maybes"]


def test_exact_under_forced_false_positives(ray_session):
    # 1 bit/key saturates the bloom -> many false positives; the exchange
    # verify must still produce the exact answer
    seen, new = _corpora(seed=9)
    out, m = unseen_docs(
        _mk(new, 1000).repartition(3), _mk(seen).repartition(3), bits_per_key=1
    )
    assert out.to_pandas().sort_values("doc_id").doc_id.tolist() == _expected(seen, new)
    assert m["false_positives"] > 0  # the point of the stress


def test_no_bloom_fallback_above_cap(ray_session):
    # broadcast_max_keys below n_seen: every new row becomes a maybe and
    # the exchange resolves the full anti-join
    seen, new = _corpora(seed=13)
    out, m = unseen_docs(
        _mk(new, 1000), _mk(seen), broadcast_max_keys=10
    )
    assert "bloom_bits" not in m
    assert m["maybes"] == len(new)
    assert out.to_pandas().sort_values("doc_id").doc_id.tolist() == _expected(seen, new)


def test_degenerate_sides(ray_session):
    seen, new = _corpora(seed=17)
    # empty seen: everything is unseen, zero maybes
    out, m = unseen_docs(_mk(new, 1000), _mk([]))
    assert out.count() == len(new) and m["maybes"] == 0
    # empty new
    out2, _ = unseen_docs(_mk([]), _mk(seen))
    assert out2.count() == 0
    # new entirely inside seen
    out3, m3 = unseen_docs(_mk(seen[:50], 1000), _mk(seen))
    assert out3.count() == 0 and m3["dups_dropped"] == 50
    # empty-string text present on both sides must match too
    out4, _ = unseen_docs(_mk(["", "zz"], 1000), _mk(["", "yy"]))
    assert out4.to_pandas().doc_id.tolist() == [1001]


def test_span_hash_pinned_to_horner():
    texts = ["", "a", "ab", "ba", "hello world", "x" * 500, "hello worle"]
    data = np.frombuffer("".join(texts).encode(), dtype=np.uint8)
    offs = np.cumsum([0] + [len(t) for t in texts]).astype(np.int64)
    got = span_hash_u64(offs, data)
    with np.errstate(over="ignore"):
        for t, g in zip(texts, got):
            h = U64(0)
            for c in t.encode():
                h = h * POLY_B + U64(c)
            exp = hash_pair_u64(np.array([h]), np.array([len(t)], dtype=np.uint64))[0]
            assert g == exp
    assert len(set(got.tolist())) == len(texts)  # incl. "" vs others
