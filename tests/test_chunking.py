"""Chunking tests: naive reference across chunk/overlap configs,
degenerate docs, non-ASCII routing, partition invariance, validation."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

TEXTS = [
    "a b c d e f g",
    "",
    "x y",
    "naïve schön eins zwei drei vier sieben acht",
    "  lead  trail  ",
    "single",
]


def _naive(texts, chunk, overlap):
    step = chunk - overlap
    rows = []
    for i, tx in enumerate(texts):
        w = tx.split()
        s = j = 0
        while s < len(w):
            rows.append((i, j, " ".join(w[s : s + chunk]), len(w[s : s + chunk])))
            j += 1
            s += step
    return rows


def _run(texts, chunk, overlap, n_blocks=1):
    from raydedup.stages.chunking import chunk_documents

    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
        )
    )
    if n_blocks > 1:
        ds = ds.repartition(n_blocks)
    df = chunk_documents(ds, chunk, overlap).to_pandas()
    return sorted(map(tuple, df.itertuples(index=False)))


def test_matches_naive(ray_session):
    for chunk, overlap in [(3, 0), (3, 1), (4, 2), (1, 0), (100, 0)]:
        assert _run(TEXTS, chunk, overlap) == sorted(_naive(TEXTS, chunk, overlap)), (
            chunk,
            overlap,
        )


def test_partition_invariance_and_validation(ray_session):
    assert _run(TEXTS, 3, 1, n_blocks=4) == _run(TEXTS, 3, 1)
    from raydedup.stages.chunking import chunk_documents

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["a"]})
    )
    with pytest.raises(ValueError):
        chunk_documents(ds, 0)
    with pytest.raises(ValueError):
        chunk_documents(ds, 4, overlap=4)
