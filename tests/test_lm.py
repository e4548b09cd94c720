"""Unigram LM whole-bit surprisal (stages/lm.py) vs a naive
Counter/bit_length reference, degenerate docs, partition invariance."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from raydedup.stages.lm import term_counts, unigram_surprisal


def _tokens(text: str) -> list[str]:
    return [w for w in text.strip().lower().split() if w]


def _naive(texts: dict[int, str]) -> pd.DataFrame:
    cnt: Counter[str] = Counter()
    for t in texts.values():
        cnt.update(_tokens(t))
    total = sum(cnt.values())
    bn = total.bit_length() - 1 if total > 0 else 0
    rows = []
    for d, t in texts.items():
        toks = _tokens(t)
        bits = sum(bn - (cnt[w].bit_length() - 1) for w in toks)
        n = len(toks)
        rows.append(
            {
                "doc_id": d,
                "n_tokens": n,
                "bits_sum": bits,
                "mean_bits": bits / n if n else 0.0,
            }
        )
    return (
        pd.DataFrame(rows)
        .astype({"doc_id": "int64", "n_tokens": "int64", "bits_sum": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _run(texts: dict[int, str], **kw) -> pd.DataFrame:
    ds = rd.from_items(
        [{"doc_id": d, "text": t} for d, t in texts.items()], **kw
    )
    return (
        unigram_surprisal(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


CORPUS = {
    1: "the cat sat on the mat",
    2: "the dog sat on the log",
    3: "a singleton zebra",
    4: "",
    5: "   ",
    6: "café naïve café 中文 tokens here",
    7: "the the the the the the the the",
    8: "x",
}


def test_matches_naive(ray_session):
    got = _run(CORPUS)
    want = _naive(CORPUS)
    pd.testing.assert_frame_equal(got, want)


def test_term_counts_exact(ray_session):
    tc = term_counts(
        rd.from_items([{"doc_id": d, "text": t} for d, t in CORPUS.items()])
    ).to_pandas()
    cnt: Counter[str] = Counter()
    for t in CORPUS.values():
        cnt.update(_tokens(t))
    got = dict(zip(tc["token"], tc["cnt"]))
    assert got == dict(cnt)


def test_partition_invariance(ray_session):
    texts = {
        i: " ".join(
            f"w{(i * 7 + j * 13) % 23}" for j in range((i % 9) + 1)
        )
        for i in range(60)
    }
    a = _run(texts, override_num_blocks=1)
    b = _run(texts, override_num_blocks=13)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(a, _naive(texts))


def test_empty_corpus(ray_session):
    got = _run({1: "", 2: "  "})
    assert got["n_tokens"].tolist() == [0, 0]
    assert got["bits_sum"].tolist() == [0, 0]
    assert got["mean_bits"].tolist() == [0.0, 0.0]


def test_surprisal_orders_rarity(ray_session):
    # rare-vocab doc scores strictly higher mean_bits than stopword soup
    texts = {1: "common common common common common", 2: "rareword"}
    got = _run(texts).set_index("doc_id")
    assert got.loc[2, "mean_bits"] > got.loc[1, "mean_bits"]
