"""Passage-level dedup tests: composite-pid roundtrip, exact and
near-dup passage clustering, scrub reassembly, full-doc drop,
partition invariance, cap guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydedup.config import DedupConfig
from raydedup.stages.passagededup import (
    PASSAGE_CAP,
    passage_docs,
    run_passage_dedup,
    scrub_passages,
)

CFG = DedupConfig(batch_size=256)


def _mkdocs(texts, n_blocks=1):
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    ds = rd.from_arrow(t)
    if n_blocks > 1:
        ds = ds.repartition(n_blocks)
    return ds


def _words(seed, n):
    rng = np.random.default_rng(seed)
    return " ".join(f"w{rng.integers(0, 5000)}" for _ in range(n))


def test_passage_docs_pid_roundtrip():
    texts = [_words(1, 70), "", _words(2, 10)]
    out = passage_docs(_mkdocs(texts), chunk_tokens=32).to_pandas()
    pids = np.sort(out["doc_id"].to_numpy(np.int64))
    # doc 0: 3 chunks (32+32+6), doc 1: none, doc 2: 1 chunk
    expect = np.sort(
        np.array([0, 1, 2, 2 * PASSAGE_CAP], dtype=np.int64)
        + np.array([0, 0, 0, 0])
    )
    assert np.array_equal(pids, np.array([0, 1, 2, 2 * PASSAGE_CAP]))
    assert np.array_equal(expect, pids)
    # passage text is the whitespace-normalized chunk
    row = out[out.doc_id == 2 * PASSAGE_CAP].iloc[0]
    assert row["text"] == texts[2]


def test_exact_dup_passage_clusters_and_scrub():
    shared = _words(7, 32)  # exactly one chunk
    texts = [
        shared + " " + _words(10, 32),  # doc 0: [shared, u0]
        shared + " " + _words(11, 32),  # doc 1: [shared, u1]
        shared,  # doc 2: [shared] only -> fully scrubbed
        _words(12, 32),  # doc 3: unique single chunk
    ]
    cl = (
        run_passage_dedup(_mkdocs(texts), CFG, chunk_tokens=32)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # the three `shared` chunks share one cluster rooted at pid 0
    sh = cl[(cl.chunk_id == 0) & (cl.doc_id.isin([0, 1, 2]))]
    assert set(sh.cluster_id) == {0}
    assert list(sh.is_representative) == [True, False, False]

    sc = (
        scrub_passages(_mkdocs(texts), CFG, chunk_tokens=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 2 lost its only chunk
    assert list(sc.doc_id) == [0, 1, 3]
    assert sc[sc.doc_id == 0].iloc[0]["text"] == texts[0]
    # doc 1 keeps only its unique tail
    assert sc[sc.doc_id == 1].iloc[0]["text"] == " ".join(texts[1].split()[32:])
    assert list(sc.n_chunks_kept) == [2, 1, 1]


def test_near_dup_passage_verified():
    base = _words(21, 64).split()
    edited = list(base)
    edited[-1] = "zzz"  # 1/64 tokens differ -> J ~ 0.85 >= tau
    texts = [
        " ".join(base) + " " + _words(22, 64),
        " ".join(edited) + " " + _words(23, 64),
    ]
    cl = (
        run_passage_dedup(_mkdocs(texts), CFG, chunk_tokens=64)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    first = cl[cl.chunk_id == 0]
    assert set(first.cluster_id) == {0}
    sc = scrub_passages(_mkdocs(texts), CFG, chunk_tokens=64).to_pandas()
    assert sorted(sc.n_chunks_kept) == [1, 2]


def test_partition_invariance():
    texts = [_words(i, 50) if i % 3 else _words(0, 50) for i in range(12)]
    a = (
        run_passage_dedup(_mkdocs(texts, 1), CFG, chunk_tokens=32)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    b = (
        run_passage_dedup(_mkdocs(texts, 5), CFG, chunk_tokens=32)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_cap_guard_raises():
    from raydedup.stages.passagededup import _pid_batch

    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "chunk_id": pa.array([PASSAGE_CAP], pa.int64()),
            "text_chunk": pa.array(["x"], pa.large_string()),
        }
    )
    with pytest.raises(ValueError, match="PASSAGE_CAP"):
        _pid_batch(t)


def test_empty_input():
    ds = _mkdocs([])
    out = run_passage_dedup(ds, CFG, chunk_tokens=32)
    # Ray's to_pandas() drops columns on fully-empty datasets; the
    # Dataset-level schema is the stable contract
    assert out.count() == 0
    assert out.schema().names == [
        "doc_id",
        "chunk_id",
        "cluster_id",
        "is_representative",
    ]


def test_degenerate_docs(ray_session):
    """Null / empty / 1-char texts: identity attach, script profile and
    scrub all handle them; chunkless docs are dropped from scrub."""
    import ray.data as rd

    from raydedup.stages.extract import docs_identity_batch
    from raydedup.stages.textstats import script_profile

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["", "x", None, "a b c d e"], pa.large_string()),
        }
    )
    docs = rd.from_arrow(t)
    sp = (
        script_profile(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert list(sp.n_chars) == [0, 1, 0, 9]
    ident = docs.map_batches(docs_identity_batch, batch_format="pyarrow")
    sc = (
        scrub_passages(ident, CFG, chunk_tokens=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # empty and null docs produce no chunks -> dropped; others intact
    assert list(sc.doc_id) == [1, 3]
    assert list(sc.text) == ["x", "a b c d e"]
