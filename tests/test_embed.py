"""EmbedKernel tests: naive per-doc reference parity, batch/partition
invariance, ASCII vs non-ASCII path consistency, empty docs, exact-dup
identity, and the docs -> embed -> semdedup composition."""

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.hashing import POLY_B, U64, hash_strings_u64, mix64
from raydedup.stages.embed import (
    DEFAULT_DIM,
    DEFAULT_N_BUCKETS,
    EMBED_SEED,
    EmbedKernel,
    embed_docs,
)


def _naive_embed(text, n_buckets=DEFAULT_N_BUCKETS, dim=DEFAULT_DIM, seed=EMBED_SEED):
    """Independent per-doc scalar reference of the model definition."""
    out = np.zeros(dim, dtype=np.int64)
    words = text.lower().split()
    if not words:
        return out
    for w in words:
        h = int(hash_strings_u64([w], mixed=False)[0])
        b = h % n_buckets
        with np.errstate(over="ignore"):
            g = int(mix64(U64(b) * POLY_B + U64(seed)))
        for j in range(dim):
            out[j] += 1 if (g >> j) & 1 else -1
    return out


def _docs_table(texts, ids=None):
    n = len(texts)
    if ids is None:
        ids = list(range(n))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _run_kernel(texts, ids=None, **kw):
    t = _docs_table(texts, ids)
    out = EmbedKernel(**kw)(t)
    mat = np.asarray(
        out.column("embedding").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
    ).reshape(t.num_rows, -1)
    return out.column("vec_id").to_numpy(zero_copy_only=False), mat


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "",
    "   ",
    "one",
    "The QUICK brown FOX jumps over the lazy dog",
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "alpha beta " * 50,
]


def test_matches_naive_reference():
    ids, mat = _run_kernel(TEXTS)
    for i, t in enumerate(TEXTS):
        np.testing.assert_array_equal(mat[i], _naive_embed(t).astype(np.float32))


def test_empty_doc_is_zero_vector():
    _, mat = _run_kernel(["", "   ", "\t\n"])
    assert not mat.any()


def test_case_insensitive_and_exact_dup_identity():
    _, mat = _run_kernel(TEXTS)
    np.testing.assert_array_equal(mat[0], mat[5])


def test_batch_layout_invariance():
    """Each doc's vector is independent of its batch neighbours —
    including when a non-ASCII doc forces the mixed-path split."""
    mixed = TEXTS + ["naïve café résumé", "日本語 テキスト"]
    _, full = _run_kernel(mixed)
    for i, t in enumerate(mixed):
        _, solo = _run_kernel([t])
        np.testing.assert_array_equal(full[i], solo[0])


def test_nonascii_matches_naive():
    _, mat = _run_kernel(["naïve café naïve", "ascii text here"])
    np.testing.assert_array_equal(
        mat[0], _naive_embed("naïve café naïve").astype(np.float32)
    )


def test_null_text_is_zero_vector():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["hello world", None], pa.string()),
        }
    )
    out = EmbedKernel()(t)
    mat = np.asarray(
        out.column("embedding").combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        )
    ).reshape(2, -1)
    assert not mat[1].any() and mat[0].any()


def test_dataset_partition_invariance(ray_session):
    import ray.data as rd

    t = _docs_table(TEXTS * 8, ids=list(range(len(TEXTS) * 8)))
    a = (
        embed_docs(rd.from_arrow(t).repartition(1), concurrency=1, batch_size=7)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    b = (
        embed_docs(rd.from_arrow(t).repartition(5), concurrency=2, batch_size=64)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert a.embedding.iloc[0].dtype == np.float32


def test_compose_semdedup_flags_planted_dups(ray_session):
    import ray.data as rd

    from raydedup.stages.semdedup import semdedup

    base = [
        f"document number {i} with some distinctive words token{i} marker{i * 7}"
        for i in range(30)
    ]
    # 3 exact copies of doc 0 planted at high ids
    texts = base + [base[0]] * 3
    ds = rd.from_arrow(_docs_table(texts)).repartition(4)
    emb = embed_docs(ds, concurrency=2, batch_size=16)
    verdicts = (
        semdedup(emb, threshold=0.95, n_bucket_bits=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert len(verdicts) == len(texts)
    planted = verdicts[verdicts.vec_id >= 30]
    assert (planted.keep == 0).all()
    assert (planted.dup_of == 0).all()
    assert verdicts[verdicts.vec_id == 0].keep.item() == 1
