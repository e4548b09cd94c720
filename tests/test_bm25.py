"""BM25 ranked-search tests: naive reference (same float expression
order), tie-breaking at the k boundary, empty docs, partition
invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _mkdocs(rows, n_blocks: int = 1):
    import ray.data as rd

    ids, texts = zip(*rows)
    tbl = pa.table(
        {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.large_string())}
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def _naive(rows, terms, k, k1=1.2, b=0.75):
    tset = sorted({t.lower() for t in terms})
    toks = {i: [w for w in t.strip().lower().split()] if t.strip() else [] for i, t in rows}
    n = len(rows)
    sdl = sum(len(v) for v in toks.values())
    avgdl = sdl / n
    dfs = [sum(1 for v in toks.values() if term in v) for term in tset]
    out = []
    for i, _ in rows:
        tv = toks[i]
        dl = float(len(tv))
        score = 0.0
        matched = 0
        for j, term in enumerate(tset):
            tf = float(tv.count(term))
            if tf > 0:
                matched += 1
            idf = ((n - dfs[j]) + 0.5) / (dfs[j] + 0.5)
            score = score + idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        if matched:
            out.append((i, score, len(tv), matched))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


ROWS = [
    (1, "alpha beta gamma alpha"),
    (2, "alpha alpha alpha alpha alpha"),
    (3, "beta beta gamma delta"),
    (4, "gamma delta epsilon zeta eta theta iota kappa"),
    (5, ""),  # empty doc: counted in N, never matches
    (6, "alpha beta"),
    (7, "delta epsilon"),  # no query terms
    (8, "Alpha BETA"),  # case folding
    (9, "alpha beta"),  # exact tie with doc 6 -> doc_id order
]
TERMS = ["alpha", "beta"]


def test_matches_naive(ray_session):
    from raydedup.stages.bm25 import bm25_search

    got = bm25_search(_mkdocs(ROWS), TERMS, k=5).to_pandas()
    want = _naive(ROWS, TERMS, 5)
    assert [int(r.doc_id) for r in got.itertuples(index=False)] == [w[0] for w in want]
    for r, w in zip(got.itertuples(index=False), want):
        assert r.score == w[1]  # bit-exact: identical expression order
        assert r.dl == w[2] and r.n_matched == w[3]
    assert list(got["rank"]) == [1, 2, 3, 4, 5]


def test_tie_break_and_filter(ray_session):
    from raydedup.stages.bm25 import bm25_search

    got = bm25_search(_mkdocs(ROWS), TERMS, k=20).to_pandas()
    ids = [int(r) for r in got["doc_id"]]
    assert 5 not in ids and 7 not in ids  # non-matching docs excluded
    assert 8 in ids  # case-folded match
    # docs 6, 8, 9 lower to identical text -> identical score; doc_id order
    assert ids.index(8) == ids.index(6) + 1
    assert ids.index(9) == ids.index(6) + 2


def test_partition_invariance(ray_session):
    from raydedup.stages.bm25 import bm25_search

    a = bm25_search(_mkdocs(ROWS), TERMS, k=6).to_pandas()
    b = bm25_search(_mkdocs(ROWS, n_blocks=5), TERMS, k=6).to_pandas()
    assert a.equals(b)


def test_no_match_anywhere(ray_session):
    from raydedup.stages.bm25 import bm25_search

    got = bm25_search(_mkdocs(ROWS), ["nosuchtoken"], k=5)
    assert got.num_rows == 0
