"""Duplicated-n-gram fraction (stages/dupngrams.py) vs a naive
per-doc set reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raydedup.stages.dupngrams import dup_ngram_fraction


def _naive(texts, ids, k=5, min_docs=2):
    sets = {}
    for i, t in zip(ids, texts):
        ws = t.strip().lower().split()
        sh = {" ".join(ws[j : j + k]) for j in range(len(ws) - k + 1)}
        if sh:
            sets[i] = sh
    from collections import Counter

    df = Counter()
    for sh in sets.values():
        df.update(sh)
    rows = []
    for i in sorted(sets):
        total = len(sets[i])
        dup = sum(1 for s in sets[i] if df[s] >= min_docs)
        rows.append((i, total, dup, dup / total))
    return pd.DataFrame(
        rows, columns=["doc_id", "n_shingles", "n_dup", "dup_frac"]
    )


def _corpus(n=300, seed=3):
    rng = np.random.default_rng(seed)
    vocab = [f"w{j}" for j in range(40)]
    texts = []
    for i in range(n):
        if i % 17 == 0:
            texts.append("too short")  # < 5 tokens, drops out
            continue
        ln = int(rng.integers(5, 30))
        words = [vocab[int(x)] for x in rng.integers(0, len(vocab), size=ln)]
        if i % 3 == 0:
            words[:5] = ["a", "b", "c", "d", "e"]  # shared 5-gram block
        texts.append(" ".join(words))
    return texts, np.arange(n, dtype=np.int64)


def test_matches_naive(ray_session):
    texts, ids = _corpus()
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    ).repartition(9)
    got = (
        dup_ngram_fraction(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _naive(texts, ids)
    pd.testing.assert_frame_equal(got, want)


def test_partition_invariance_and_empty(ray_session):
    texts, ids = _corpus(120, seed=9)
    t = pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    a = dup_ngram_fraction(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    b = (
        dup_ngram_fraction(rd.from_arrow(t).repartition(13))
        .to_pandas()
        .sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    out = dup_ngram_fraction(rd.from_arrow(empty))
    assert out.schema().names == ["doc_id", "n_shingles", "n_dup", "dup_frac"]
    assert len(out.to_pandas()) == 0


def test_non_ascii_fallback_matches_naive(ray_session):
    """Non-ASCII docs route through the per-doc fallback; shared
    5-grams still count across the ASCII/non-ASCII boundary when the
    tokens themselves are identical."""
    texts = [
        "das ist ein längerer deutscher satz mit umlauten öäü dabei",
        "das ist ein längerer deutscher satz mit anderen worten hier",
        "plain ascii document with its own words entirely separate one",
        "café au lait",  # < 5 tokens after split -> dropped
    ]
    ids = np.arange(4, dtype=np.int64)
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    )
    got = (
        dup_ngram_fraction(docs)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = _naive(texts, ids)
    pd.testing.assert_frame_equal(got, want)
