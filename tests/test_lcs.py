"""Matched-segment extraction (stages/lcs.py): token-level longest
common substring — the Panako matched-segment start/stop analog
(strategy/QueryResult.java:31-73)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from raydedup.stages.lcs import token_lcs, token_sequence_table


def naive_lcs(a: list[int], b: list[int]) -> tuple[int, int, int]:
    """O(n*m) reference: longest common contiguous run; ties -> min
    a_start, then min b_start."""
    best = (0, -1, -1)
    na, nb = len(a), len(b)
    for i in range(na):
        for j in range(nb):
            k = 0
            while i + k < na and j + k < nb and a[i + k] == b[j + k]:
                k += 1
            if k > best[0]:
                best = (k, i, j)
    return best


@given(
    st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=50),
    st.lists(st.integers(min_value=0, max_value=6), min_size=0, max_size=50),
)
@settings(max_examples=120, deadline=None)
def test_token_lcs_length_equals_naive(xs, ys):
    """Small alphabet forces heavy token repetition — the adversarial
    case for both the binary search and the hash windows."""
    ha = np.array(xs, dtype=np.uint64)
    hb = np.array(ys, dtype=np.uint64)
    got = token_lcs(ha, hb)
    want = naive_lcs(xs, ys)
    assert got[0] == want[0]
    if got[0] > 0:
        # the reported span must be a REAL common run of that length
        L, a0, b0 = got
        assert xs[a0 : a0 + L] == ys[b0 : b0 + L]
        assert a0 == want[1]  # min a_start tie-break


def test_token_lcs_edges():
    e = np.empty(0, dtype=np.uint64)
    x = np.array([1, 2, 3], dtype=np.uint64)
    assert token_lcs(e, x) == (0, -1, -1)
    assert token_lcs(x, e) == (0, -1, -1)
    assert token_lcs(x, x) == (3, 0, 0)
    y = np.array([9, 9, 9], dtype=np.uint64)
    assert token_lcs(x, y) == (0, -1, -1)


def test_token_sequence_table_matches_per_doc(ray_session):
    """Ordered token hashes from the batch path == per-doc tokenize +
    hash, for an ASCII/non-ASCII mixed batch."""
    from raydedup.stages.signatures import _WordHashCache, tokenize

    texts = ["Alpha beta  GAMMA", "café au lait café", "", "  x  "]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    out = token_sequence_table(t)
    cache = _WordHashCache()
    for d, text in enumerate(texts):
        words = tokenize(text)
        want = cache.hash_words(words) if words else np.empty(0, np.uint64)
        got = np.asarray(out.column("shingles")[d].as_py(), dtype=np.int64).view(
            np.uint64
        )
        np.testing.assert_array_equal(got, want)
        assert out.column("n")[d].as_py() == len(words)


def test_matched_segments_e2e(ray_session):
    """Planted shared segment: b embeds 40 consecutive tokens of a; the
    stage must report exactly that run and its offsets."""
    import ray.data as rd

    from raydedup.stages.lcs import matched_segments

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(500)]

    def txt(seq):
        return " ".join(seq)

    a_toks = [words[i] for i in rng.integers(0, 500, size=120)]
    shared = a_toks[50:90]  # 40 tokens
    b_toks = (
        [words[i] for i in rng.integers(0, 500, size=30)]
        + shared
        + [words[i] for i in rng.integers(0, 500, size=25)]
    )
    c_toks = [words[i] for i in rng.integers(0, 500, size=80)]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [txt(a_toks), txt(b_toks), txt(c_toks)],
            }
        )
    )
    pairs = pa.table(
        {"a": pa.array([1, 1], pa.int64()), "b": pa.array([2, 3], pa.int64())}
    )
    df = (
        matched_segments(pairs, docs)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    hit = df.iloc[0]
    assert hit.lcs_tokens >= 40
    # the planted run is recoverable at the reported offsets
    L, a0, b0 = int(hit.lcs_tokens), int(hit.a_start), int(hit.b_start)
    assert a_toks[a0 : a0 + L] == b_toks[b0 : b0 + L]
    assert abs(hit.lcs_ratio - L / min(len(a_toks), len(b_toks))) < 1e-12
    miss = df.iloc[1]
    assert miss.lcs_tokens < 5  # unrelated docs share at most tiny runs


def test_matched_segments_multi_wave_equals_single(ray_session):
    """Pair sets above cfg.verify_broadcast_max_docs process in
    independent waves; results must equal the single-wave output."""
    import ray.data as rd

    from raydedup.config import DedupConfig
    from raydedup.stages.lcs import matched_segments

    rng = np.random.default_rng(8)
    words = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(words[j] for j in rng.integers(0, 200, size=60))
        for _ in range(30)
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "text": texts,
            }
        )
    )
    pav = np.arange(0, 15, dtype=np.int64)
    pbv = np.arange(15, 30, dtype=np.int64)
    pairs = rd.from_arrow(
        pa.table({"a": pa.array(pav), "b": pa.array(pbv)})
    ).repartition(5)
    one = (
        matched_segments(pairs, docs, DedupConfig())
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    many = (
        matched_segments(pairs, docs, DedupConfig(verify_broadcast_max_docs=1))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert one.equals(many)
    assert len(one) == 15
