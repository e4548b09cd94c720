"""Bigram conditional-surprisal tests: naive-reference parity, word
ORDER sensitivity (the property the unigram model lacks), partition
invariance, degenerate docs."""

import numpy as np
import pyarrow as pa

from raydedup.stages.lm import bigram_surprisal


def _docs_ds(rd, rows, parts=4):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts else ds


def _bl(x: int) -> int:
    return int(x).bit_length() - 1


def _naive(rows):
    c1, c2, n = {}, {}, 0
    seqs = {}
    for did, text in rows:
        toks = text.lower().split()
        seqs[did] = toks
        for w in toks:
            c1[w] = c1.get(w, 0) + 1
            n += 1
        for a, b in zip(toks, toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    out = {}
    for did, toks in seqs.items():
        if not toks:
            out[did] = (0, 0)
            continue
        bits = _bl(n) - _bl(c1[toks[0]])
        for a, b in zip(toks, toks[1:]):
            bits += _bl(c1[a]) - _bl(c2[(a, b)])
        out[did] = (len(toks), bits)
    return out


def _corpus(seed=31, n=50):
    rng = np.random.Generator(np.random.PCG64(seed))
    vocab = [f"w{i}" for i in range(40)]
    rows = [
        (d, " ".join(rng.choice(vocab, size=int(rng.integers(5, 40)))))
        for d in range(n)
    ]
    rows.append((900, ""))
    rows.append((901, "solo"))
    return rows


def test_matches_naive_reference(ray_session):
    import ray.data as rd

    rows = _corpus()
    df = (
        bigram_surprisal(_docs_ds(rd, rows))
        .to_pandas().sort_values("doc_id").set_index("doc_id")
    )
    ref = _naive(rows)
    assert set(df.index) == set(ref)
    for did, (n_tok, bits) in ref.items():
        assert int(df.loc[did, "n_tokens"]) == n_tok
        assert int(df.loc[did, "bits_sum"]) == bits, did
    assert float(df.loc[900, "mean_bits"]) == 0.0


def test_order_sensitivity(ray_session):
    import ray.data as rd

    # two docs, same bag of words, different order: the common order
    # ("x y" seen twice) is cheaper than the rare one under the bigram
    # model, while a unigram model scores them identically
    rows = [
        (0, "x y x y x y x y"),
        (1, "x y x y x y x y"),
        (2, "y x y x y x y x"),
    ]
    df = (
        bigram_surprisal(_docs_ds(rd, rows, parts=2))
        .to_pandas().set_index("doc_id")
    )
    assert int(df.loc[0, "bits_sum"]) == int(df.loc[1, "bits_sum"])
    ref = _naive(rows)
    for did in (0, 1, 2):
        assert int(df.loc[did, "bits_sum"]) == ref[did][1]


def test_partition_invariance(ray_session):
    import ray.data as rd

    rows = _corpus(seed=8, n=40)
    a = (
        bigram_surprisal(_docs_ds(rd, rows, parts=2))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        bigram_surprisal(_docs_ds(rd, rows, parts=9))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_perplexity_buckets_exact_ntile(ray_session):
    """NTILE semantics on uneven groups: n rows, k tiles -> the first
    (n % k) tiles carry ceil(n/k) rows; ordering (mean ASC, doc_id ASC)
    deterministic; bucket 1 is the lowest-surprisal head."""
    import ray.data as rd

    from raydedup.stages.lm import perplexity_buckets

    rows = _corpus(seed=12, n=47)  # 47 docs -> uneven terciles
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(
                ["en" if r[0] % 2 == 0 else "de" for r in rows], pa.string()
            ),
        }
    )
    df = (
        perplexity_buckets(rd.from_arrow(t).repartition(5), n_buckets=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(df) == len(rows)
    for lang, grp in df.groupby("lang"):
        g = grp.sort_values(["mean_bits", "doc_id"]).reset_index(drop=True)
        n, k = len(g), 3
        base, rem = divmod(n, k)
        want = []
        for tile in range(k):
            want += [tile + 1] * (base + (1 if tile < rem else 0))
        assert g["ppl_bucket"].tolist() == want, lang
        # monotone: bucket never decreases as mean increases
        assert (g["ppl_bucket"].diff().fillna(0) >= 0).all()


def test_perplexity_buckets_partition_invariance(ray_session):
    import ray.data as rd

    from raydedup.stages.lm import perplexity_buckets

    rows = _corpus(seed=4, n=30)
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
        }
    )
    a = (
        perplexity_buckets(rd.from_arrow(t).repartition(2))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        perplexity_buckets(rd.from_arrow(t).repartition(7))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.equals(b)
