"""b-bit minhash near-dup path: planted-pair recall, estimator
threshold, partition invariance."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from raydedup.config import DedupConfig
from raydedup.stages.b1dedup import b1_neardup_pairs


def _docs(texts, n_blocks=2):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks)


def test_planted_pairs(ray_session):
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "other animals watch from the fence and comment loudly about "
        "everything they see in the yard during the long afternoon"
    )
    texts = [
        base,
        base + " extra",                      # near-dup of 0
        base.replace("quick", "rapid"),       # near-dup of 0
        "completely different content about cooking pasta with garlic "
        "and olive oil for dinner guests arriving later this evening "
        "who expect something memorable on their plates tonight",
        "yet another unrelated document describing mountain weather "
        "patterns and the preparation hikers should undertake before "
        "attempting any serious climb in early spring conditions",
    ]
    out = b1_neardup_pairs(_docs(texts), DedupConfig(batch_size=3), hamming_max=24)
    pairs = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert (0, 1) in pairs and (0, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)
    assert all(a < b for a, b in pairs)
    ham = dict(zip(zip(out.column("a").to_pylist(), out.column("b").to_pylist()),
                   out.column("hamming").to_pylist()))
    assert all(0 <= h <= 24 for h in ham.values())


def test_partition_invariance_and_empty(ray_session):
    texts = ["shared words in this document repeated here"] * 3 + ["tiny"]
    a = b1_neardup_pairs(_docs(texts, 1), hamming_max=5)
    b = b1_neardup_pairs(_docs(texts, 4), hamming_max=5)
    assert a.to_pydict() == b.to_pydict()
    # identical docs have hamming 0
    assert set(a.column("hamming").to_pylist()) == {0}
    empty = b1_neardup_pairs(_docs(["one doc only"]))
    assert empty.num_rows == 0
    assert empty.schema.names == ["a", "b", "hamming"]


def test_rejects_non_128_perm_config(ray_session):
    """pack_b1 zero-pads below 128 perms, which would inflate the
    Hamming agreement (padded bits always match) — the b=1 path rejects
    such configs loudly instead of silently over-accepting (ADVICE r3)."""
    import pytest

    with pytest.raises(ValueError, match="n_perms == 128"):
        b1_neardup_pairs(
            _docs(["a doc", "b doc"]),
            DedupConfig(n_perms=64, n_bands=8, rows_per_band=8),
        )
