"""DSIR whole-bit importance-weight tests: naive-reference parity,
selection behavior on a planted target-vs-raw vocabulary split,
partition invariance, and degenerate slices (no target docs, all
target docs, empty text)."""

import numpy as np
import pyarrow as pa

from raydedup.stages.dsir import dsir_weights


def _docs_ds(rd, rows, parts=4):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts else ds


def _bl(x: int) -> int:
    return int(x).bit_length() - 1


def _naive(rows, target="en"):
    """Reference implementation of the whole-bit DSIR weight."""
    cr, ct = {}, {}
    for _, text, lang in rows:
        for w in text.lower().split():
            cr[w] = cr.get(w, 0) + 1
            if lang == target:
                ct[w] = ct.get(w, 0) + 1
    nr = sum(cr.values()) + 1
    nt = sum(ct.values()) + 1
    out = {}
    for did, text, _ in rows:
        toks = text.lower().split()
        bits = sum(
            (_bl(ct.get(w, 0) + 1) - _bl(nt)) - (_bl(cr[w] + 1) - _bl(nr))
            for w in toks
        )
        out[did] = (len(toks), bits, 1 if bits > 0 else 0)
    return out


def _corpus():
    rng = np.random.Generator(np.random.PCG64(99))
    tgt_vocab = [f"tgt{i}" for i in range(30)]
    raw_vocab = [f"raw{i}" for i in range(30)]
    shared = [f"sh{i}" for i in range(10)]
    rows = []
    for d in range(60):
        is_en = d % 3 != 0
        vocab = (tgt_vocab if is_en else raw_vocab) + shared
        words = rng.choice(vocab, size=25).tolist()
        rows.append((d, " ".join(words), "en" if is_en else "xx"))
    rows.append((900, "", "en"))  # empty doc
    return rows


def test_matches_naive_reference(ray_session):
    import ray.data as rd

    rows = _corpus()
    df = dsir_weights(_docs_ds(rd, rows)).to_pandas().set_index("doc_id")
    ref = _naive(rows)
    for did, (n_tok, bits, keep) in ref.items():
        assert int(df.loc[did, "n_tokens"]) == n_tok
        assert int(df.loc[did, "weight_bits"]) == bits, did
        assert int(df.loc[did, "keep"]) == keep
    assert int(df.loc[900, "n_tokens"]) == 0
    assert float(df.loc[900, "avg_bits"]) == 0.0


def test_selects_target_like_docs(ray_session):
    import ray.data as rd

    rows = _corpus()
    df = dsir_weights(_docs_ds(rd, rows)).to_pandas()
    by = df.set_index("doc_id")
    en_keep = np.mean([by.loc[d, "keep"] for d, _, l in rows if l == "en" and d != 900])
    xx_keep = np.mean([by.loc[d, "keep"] for d, _, l in rows if l == "xx"])
    # target-vocab docs must be preferred over off-target docs
    assert en_keep > 0.9
    assert xx_keep < 0.1


def test_partition_invariance(ray_session):
    import ray.data as rd

    rows = _corpus()
    a = (
        dsir_weights(_docs_ds(rd, rows, parts=2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        dsir_weights(_docs_ds(rd, rows, parts=11))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_no_target_docs(ray_session):
    import ray.data as rd

    rows = [(i, "alpha beta gamma", "xx") for i in range(8)]
    df = dsir_weights(_docs_ds(rd, rows)).to_pandas()
    # degenerate slice (N_T = 0): the add-one smoothing dominates and
    # the whole-bit weight is bl(N_R+1) - bl(cr+1) per token — the
    # contract here is exact naive parity, not a particular keep rate
    ref = _naive(rows)
    for _, r in df.iterrows():
        assert ref[int(r["doc_id"])][1] == int(r["weight_bits"])


def test_all_target_docs(ray_session):
    import ray.data as rd

    rows = [(i, "alpha beta gamma delta", "en") for i in range(8)]
    df = dsir_weights(_docs_ds(rd, rows)).to_pandas()
    ref = _naive(rows)
    for _, r in df.iterrows():
        assert ref[int(r["doc_id"])][1] == int(r["weight_bits"])
