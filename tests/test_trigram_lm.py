"""Trigram backoff-surprisal tests: naive-reference parity, context
sensitivity beyond the bigram model, partition invariance, degenerate
docs, and the perplexity_buckets model option."""

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.stages.lm import perplexity_buckets, trigram_surprisal


def _docs_ds(rd, rows, parts=4, lang=None):
    t = {
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }
    if lang is not None:
        t["lang"] = pa.array(lang, pa.string())
    ds = rd.from_arrow(pa.table(t))
    return ds.repartition(parts) if parts else ds


def _bl(x: int) -> int:
    return int(x).bit_length() - 1


def _naive(rows):
    c1, c2, c3, n = {}, {}, {}, 0
    seqs = {}
    for did, text in rows:
        toks = text.lower().split()
        seqs[did] = toks
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
            n += 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            c3[(a, b, c)] = c3.get((a, b, c), 0) + 1
    out = {}
    for did, toks in seqs.items():
        if not toks:
            out[did] = (0, 0)
            continue
        bits = _bl(n) - _bl(c1[toks[0]])
        if len(toks) >= 2:
            bits += _bl(c1[toks[0]]) - _bl(c2[(toks[0], toks[1])])
        for a, b, c in zip(toks, toks[1:], toks[2:]):
            bits += _bl(c2[(a, b)]) - _bl(c3[(a, b, c)])
        out[did] = (len(toks), bits)
    return out


def _corpus(seed=47, n=50):
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (d, " ".join(rng.choice(vocab, size=int(rng.integers(5, 40)))))
        for d in range(n)
    ]
    rows.append((900, ""))
    rows.append((901, "solo"))
    rows.append((902, "two words"))
    return rows


def test_matches_naive_reference(ray_session):
    import ray.data as rd

    rows = _corpus()
    df = (
        trigram_surprisal(_docs_ds(rd, rows))
        .to_pandas().sort_values("doc_id").set_index("doc_id")
    )
    ref = _naive(rows)
    assert set(df.index) == set(ref)
    for did, (n_tok, bits) in ref.items():
        assert int(df.loc[did, "n_tokens"]) == n_tok
        assert int(df.loc[did, "bits_sum"]) == bits, did
    assert float(df.loc[900, "mean_bits"]) == 0.0
    assert int(df.loc[901, "n_tokens"]) == 1
    assert int(df.loc[902, "n_tokens"]) == 2


def test_context_sensitivity_beyond_bigram(ray_session):
    """Two docs with identical bigram multisets but different trigram
    contexts: the trigram model must distinguish what the bigram model
    cannot. 'a b a b a' vs 'a b a' + padding constructed so that
    trigram counts differ while every adjacent pair is (a,b) or (b,a)."""
    import ray.data as rd

    rows = [
        (0, "a b a b a b a"),
        (1, "a b a"),
        (2, "b a b a b"),
        (3, "x y z x y z"),
        (4, "x y z z y x"),
    ]
    df = (
        trigram_surprisal(_docs_ds(rd, rows))
        .to_pandas().sort_values("doc_id").set_index("doc_id")
    )
    ref = _naive(rows)
    for did, (n_tok, bits) in ref.items():
        assert (int(df.loc[did, "n_tokens"]), int(df.loc[did, "bits_sum"])) == (
            n_tok, bits
        ), did
    # the common phrase 'x y z' repeats; the reversal is rarer per token
    assert float(df.loc[4, "mean_bits"]) >= float(df.loc[3, "mean_bits"])


def test_partition_invariance(ray_session):
    import ray.data as rd

    rows = _corpus(seed=9)
    a = (
        trigram_surprisal(_docs_ds(rd, rows, parts=1))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        trigram_surprisal(_docs_ds(rd, rows, parts=7))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_perplexity_buckets_trigram_model(ray_session):
    import ray.data as rd

    rows = _corpus(seed=13, n=40)
    langs = ["en" if r[0] % 2 == 0 else "de" for r in rows]
    ds = _docs_ds(rd, rows, lang=langs)
    out = (
        perplexity_buckets(ds, n_buckets=3, model="trigram")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(out) == len(rows)
    # exact NTILE over (mean_bits, doc_id) per lang, validated in pandas
    tri = (
        trigram_surprisal(ds, carry_cols=("lang",))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for lg, grp in tri.groupby("lang"):
        g = grp.sort_values(["mean_bits", "doc_id"]).reset_index(drop=True)
        n = len(g)
        base, rem = divmod(n, 3)
        want = []
        for tile in range(3):
            want += [tile + 1] * (base + (1 if tile < rem else 0))
        got = (
            out[out.lang == lg]
            .set_index("doc_id")
            .loc[g.doc_id, "ppl_bucket"]
            .tolist()
        )
        assert got == want, lg

    import pytest

    with pytest.raises(ValueError):
        perplexity_buckets(ds, model="kenlm")
