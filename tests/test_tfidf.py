"""Corpus term statistics (stages/tfidf.py): document frequency via
token-hash exchange and per-doc top terms by tf/df."""

from collections import Counter

import numpy as np
import pyarrow as pa
import ray.data as rd

from raydedup.stages.tfidf import doc_frequency, top_terms


def _mkdocs(texts, start_id=0):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(
                    range(start_id, start_id + len(texts)), pa.int64()
                ),
                "text": texts,
            }
        )
    )


def _naive_df(texts):
    c = Counter()
    for t in texts:
        c.update(set(t.lower().split()))
    return dict(c)


def _naive_top(texts, k, dfm):
    rows = []
    for i, t in enumerate(texts):
        tf = Counter(t.lower().split())
        scored = sorted(
            ((tok, n, dfm[tok], n / dfm[tok]) for tok, n in tf.items()),
            key=lambda x: (-x[3], x[0]),
        )[:k]
        for r, (tok, n, df, sc) in enumerate(scored, 1):
            rows.append((i, r, tok, n, df, sc))
    return rows


TEXTS = [
    "the cat sat on the mat",
    "the dog ate the cat food",
    "quantum flux capacitor THE the",
    "cat cat cat dog",
    "mat on mat off",
]


def test_doc_frequency_matches_naive(ray_session):
    got = doc_frequency(_mkdocs(TEXTS)).to_pandas()
    want = _naive_df(TEXTS)
    assert dict(zip(got.token, got.df)) == want
    # min_df filter
    got2 = doc_frequency(_mkdocs(TEXTS), min_df=2).to_pandas()
    assert dict(zip(got2.token, got2.df)) == {t: d for t, d in want.items() if d >= 2}


def test_doc_frequency_partition_invariant(ray_session):
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(50)]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 50, size=30)) for _ in range(200)
    ]
    a = doc_frequency(_mkdocs(texts)).to_pandas().sort_values("token")
    b = (
        doc_frequency(
            rd.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array(range(200), pa.int64()),
                        "text": texts,
                    }
                )
            ).repartition(19)
        )
        .to_pandas()
        .sort_values("token")
    )
    assert a.token.tolist() == b.token.tolist()
    assert a.df.tolist() == b.df.tolist()
    assert dict(zip(a.token, a.df)) == _naive_df(texts)


def test_top_terms_matches_naive(ray_session):
    k = 2
    dfm = _naive_df(TEXTS)
    want = _naive_top(TEXTS, k, dfm)
    got = (
        top_terms(_mkdocs(TEXTS), k=k)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for (i, r, tok, tf, df, sc), row in zip(want, got.itertuples(index=False)):
        assert (row.doc_id, row.rank, row.token, row.tf, row.df) == (i, r, tok, tf, df)
        assert row.score == sc  # raw IEEE division, bit-identical


def test_top_terms_exchange_matches_broadcast(ray_session):
    rng = np.random.default_rng(6)
    words = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 40, size=25)) for _ in range(120)
    ]
    a = (
        top_terms(_mkdocs(texts), k=3, method="broadcast")
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    b = (
        top_terms(_mkdocs(texts), k=3, method="exchange")
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_tfidf_non_ascii_and_empty(ray_session):
    texts = ["café au lait café", "", "plain ascii text", "  "]
    dfd = doc_frequency(_mkdocs(texts)).to_pandas()
    assert dict(zip(dfd.token, dfd.df)) == _naive_df(texts)
    tt = top_terms(_mkdocs(texts), k=5).to_pandas()
    # empty docs contribute no rows; café doc keeps its accents
    assert set(tt.doc_id) == {0, 2}
    assert "café" in set(tt[tt.doc_id == 0].token)


def test_top_terms_survives_output_block_splits(ray_session):
    """A doc's count rows must never be ranked in two pieces: with a
    tiny target block size the old counts->topk pipeline emitted
    duplicate (doc_id, rank) rows (review finding, confirmed)."""
    from ray.data import DataContext

    rng = np.random.default_rng(9)
    words = [f"w{i}" for i in range(80)]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 80, size=120))
        for _ in range(60)
    ]
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 2048  # force aggressive re-blocking
        got = (
            top_terms(_mkdocs(texts), k=3, method="broadcast")
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
    finally:
        ctx.target_max_block_size = old
    assert not got.duplicated(["doc_id", "rank"]).any()
    assert got.groupby("doc_id").size().eq(3).all()
    dfm = _naive_df(texts)
    want = _naive_top(texts, 3, dfm)
    assert [(r.doc_id, r.rank, r.token) for r in got.itertuples(index=False)] == [
        (i, r, tok) for (i, r, tok, _, _, _) in want
    ]


def test_df_commonness_matches_naive(ray_session):
    from raydedup.stages.tfidf import df_commonness

    texts = TEXTS + ["", "naïve schön the", "zzz-unique-token"]
    got = df_commonness(_mkdocs(texts)).to_pandas().sort_values("doc_id")
    dfm = _naive_df(texts)
    n = len(texts)
    for i, t in enumerate(texts):
        toks = t.lower().split()
        df_sum = sum(dfm[w] for w in toks)
        row = got[got.doc_id == i].iloc[0]
        assert row.n_tokens == len(toks) and row.df_sum == df_sum
        want = df_sum / (len(toks) * n) if toks else 0.0
        assert row.commonness == want
    # stopword-soup doc scores higher than the rare-vocab doc
    them = dict(zip(got.doc_id, got.commonness))
    assert them[len(texts) - 1] < them[2]


def test_df_commonness_partition_invariance(ray_session):
    from raydedup.stages.tfidf import df_commonness

    a = df_commonness(_mkdocs(TEXTS)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        df_commonness(_mkdocs(TEXTS).repartition(4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_vocab_stats_matches_naive(ray_session):
    from raydedup.stages.tfidf import vocab_stats

    texts = TEXTS + ["naïve schön naïve", ""]
    t = vocab_stats(_mkdocs(texts).repartition(3))
    cf = Counter()
    for x in texts:
        cf.update(x.lower().split())
    assert t.column("total_tokens")[0].as_py() == sum(cf.values())
    assert t.column("distinct_tokens")[0].as_py() == len(cf)
    assert t.column("hapax_tokens")[0].as_py() == sum(1 for v in cf.values() if v == 1)
    assert t.column("max_token_count")[0].as_py() == max(cf.values())


def test_vocab_stats_empty_corpus(ray_session):
    from raydedup.stages.tfidf import vocab_stats

    t = vocab_stats(_mkdocs(["", "   "]))
    assert t.column("total_tokens")[0].as_py() == 0
    assert t.column("distinct_tokens")[0].as_py() == 0


def test_token_freq_spectrum(ray_session):
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from raydedup.stages.tfidf import token_freq_spectrum

    texts = ["a a a b b c", "c b  a", "", "A unique"]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.large_string()),
            }
        )
    ).repartition(3)
    out = token_freq_spectrum(docs).to_pydict()
    cf = Counter()
    for t in texts:
        cf.update(t.lower().split())
    spec = Counter(cf.values())
    assert out["cf"] == sorted(spec)
    assert out["n_tokens"] == [spec[c] for c in sorted(spec)]
    # 'a'/'A' fold together: a appears 5x -> cf 5 present
    assert 5 in out["cf"]
    out2 = token_freq_spectrum(docs.repartition(1)).to_pydict()
    assert out2 == out


def test_vocab_growth(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydedup.stages.tfidf import vocab_growth

    texts = {0: "a b", 1: "a c", 3: "d e f", 8: "a g"}
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": pa.array(list(texts.values()), pa.large_string()),
            }
        )
    ).repartition(3)
    out = vocab_growth(docs).to_pydict()
    # max id 8 -> bit_length 4 -> thresholds 1,2,4,8,16
    assert out["threshold"] == [1, 2, 4, 8, 16]
    assert out["n_docs"] == [1, 2, 3, 3, 4]
    # first-occurrence vocab: T=1 {a,b}; T=2 +{c}; T=4 +{d,e,f}; T=16 +{g}
    assert out["vocab"] == [2, 3, 6, 6, 7]
    out2 = vocab_growth(docs.repartition(1)).to_pydict()
    assert out2 == out
