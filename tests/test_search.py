"""Keyword-search stage tests: AND/OR semantics, counts, case folding,
non-ASCII terms, and partition invariance."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd


def _mkdocs(texts, n_blocks: int = 1):
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
    )
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


TEXTS = [
    "alpha beta gamma alpha",
    "alpha BETA beta",
    "gamma delta",
    "Alpha only here",
    "",
    "naïve schön alpha",
]


def test_and_semantics(ray_session):
    from raydedup.stages.search import search_terms

    df = search_terms(_mkdocs(TEXTS), ["alpha", "beta"]).to_pandas().sort_values("doc_id")
    assert df.doc_id.tolist() == [0, 1]
    r0 = df[df.doc_id == 0].iloc[0]
    assert r0.n_matched == 2 and r0.n_hits == 3  # alpha x2 + beta x1
    r1 = df[df.doc_id == 1].iloc[0]
    assert r1.n_matched == 2 and r1.n_hits == 3  # alpha + BETA + beta (folded)


def test_or_semantics_and_unicode(ray_session):
    from raydedup.stages.search import search_terms

    df = (
        search_terms(_mkdocs(TEXTS), ["Beta", "schön"], mode="or")
        .to_pandas()
        .sort_values("doc_id")
    )
    assert df.doc_id.tolist() == [0, 1, 5]
    assert df[df.doc_id == 5].iloc[0].n_matched == 1


def test_validation_and_partition_invariance(ray_session):
    from raydedup.stages.search import search_terms

    with pytest.raises(ValueError):
        search_terms(_mkdocs(TEXTS), ["x"], mode="nand")
    with pytest.raises(ValueError):
        search_terms(_mkdocs(TEXTS), [])
    a = search_terms(_mkdocs(TEXTS), ["alpha"]).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        search_terms(_mkdocs(TEXTS, n_blocks=5), ["alpha"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)
