"""Deterministic sampling operators (stages/sampling.py): hash-rank
Bernoulli sample, hash-range splits, exact per-stratum top-k-by-rank."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from raydedup.hashing import U64, mix64
from raydedup.stages.sampling import (
    DEFAULT_SAMPLE_SEED,
    hash_sample,
    hash_split,
    stratified_sample,
)


def _tbl(n=5000, n_strata=5, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array(
                [f"l{int(x)}" for x in rng.integers(0, n_strata, size=n)]
            ),
        }
    )


def _rank(ids, seed=DEFAULT_SAMPLE_SEED):
    return mix64(np.asarray(ids, dtype=np.int64).view(U64) ^ U64(seed))


def test_hash_sample_rate_and_determinism(ray_session):
    t = _tbl()
    a = hash_sample(rd.from_arrow(t), 0.3).to_pandas().sort_values("doc_id")
    # rate within 5 sigma of binomial
    assert abs(len(a) - 1500) < 5 * np.sqrt(0.3 * 0.7 * 5000)
    # partition-invariant: a 17-way repartition samples the same rows
    b = (
        hash_sample(rd.from_arrow(t).repartition(17), 0.3)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert a.doc_id.tolist() == b.doc_id.tolist()
    # matches the scalar definition
    thr = np.uint64(int(0.3 * 2.0**64))
    want = np.flatnonzero(_rank(np.arange(5000)) < thr)
    assert a.doc_id.to_numpy().tolist() == want.tolist()


def test_hash_sample_edges(ray_session):
    t = _tbl(100)
    assert hash_sample(rd.from_arrow(t), 0.0).count() == 0
    assert hash_sample(rd.from_arrow(t), 1.0).count() == 100
    with pytest.raises(ValueError):
        hash_sample(rd.from_arrow(t), 1.5)


def test_hash_split_disjoint_exhaustive_stable(ray_session):
    t = _tbl(3000)
    fr = {"train": 0.8, "valid": 0.1, "test": 0.1}
    a = hash_split(rd.from_arrow(t), fr).to_pandas()
    assert len(a) == 3000 and set(a.split) <= set(fr)
    counts = a.split.value_counts()
    assert abs(counts.get("train", 0) - 2400) < 5 * np.sqrt(0.8 * 0.2 * 3000)
    # rows never move across splits under re-partitioning
    b = hash_split(rd.from_arrow(t).repartition(13), fr).to_pandas()
    am = dict(zip(a.doc_id, a.split))
    assert all(am[d] == s for d, s in zip(b.doc_id, b.split))
    with pytest.raises(ValueError):
        hash_split(rd.from_arrow(t), {"a": 0.5, "b": 0.6})


def test_hash_split_first_bucket_equals_hash_sample(ray_session):
    """Composed-sample consistency (ADVICE r3): the first split's rows
    are exactly hash_sample's rows at the same rate/seed — half-open
    [lo, hi) rank intervals, boundary ranks go to the upper split."""
    t = _tbl(4000)
    fr = {"train": 0.37, "rest": 0.63}
    split = hash_split(rd.from_arrow(t), fr).to_pandas()
    train = sorted(split[split.split == "train"].doc_id)
    samp = sorted(hash_sample(rd.from_arrow(t), 0.37).to_pandas().doc_id)
    assert train == samp
    # scalar contract: strict r < edge on the interior boundary
    edge = np.uint64(int(0.37 * 2.0**64))
    want = np.flatnonzero(_rank(np.arange(4000)) < edge).tolist()
    assert train == want


def test_stratified_sample_exact_and_invariant(ray_session):
    t = _tbl(4000, n_strata=4, seed=3)
    k = 9
    out = stratified_sample(rd.from_arrow(t), "lang", k).to_pandas()
    langs = t.column("lang").to_pandas()
    # exactly min(k, |stratum|) per stratum, and exactly the k smallest ranks
    ids = t.column("doc_id").to_numpy()
    ranks = _rank(ids)
    for lg, grp in out.groupby("lang"):
        members = ids[(langs == lg).to_numpy()]
        want = members[np.argsort(ranks[(langs == lg).to_numpy()])][:k]
        assert sorted(grp.doc_id.tolist()) == sorted(want.tolist())
    # partition-invariance
    out2 = stratified_sample(rd.from_arrow(t).repartition(23), "lang", k).to_pandas()
    assert sorted(out.doc_id.tolist()) == sorted(out2.doc_id.tolist())


def test_stratified_sample_small_strata(ray_session):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(7, dtype=np.int64)),
            "lang": pa.array(["a", "a", "a", "b", "b", "c", "c"]),
        }
    )
    out = stratified_sample(rd.from_arrow(t), "lang", 10).to_pandas()
    assert len(out) == 7  # k exceeds every stratum -> keep all
    with pytest.raises(ValueError):
        stratified_sample(rd.from_arrow(t), "lang", 0)


def test_stratified_sample_duplicate_and_shared_keys(ray_session):
    """Duplicate key values must not leak rows across strata, and a key
    winning in stratum A must not admit stratum-B rows (review finding)."""
    t = pa.table(
        {
            "doc_id": pa.array([5, 5, 5, 7, 9, 11, 13], pa.int64()),
            #          a   a   b   b  b   b   b
            "lang": pa.array(["a", "a", "b", "b", "b", "b", "b"]),
        }
    )
    out = stratified_sample(rd.from_arrow(t), "lang", 2).to_pandas()
    a_rows = out[out.lang == "a"]
    b_rows = out[out.lang == "b"]
    # stratum a has ONE distinct key (5, duplicated) -> both its rows kept
    assert sorted(a_rows.doc_id.tolist()) == [5, 5]
    # stratum b: 2 smallest-rank distinct keys among {5,7,9,11,13}
    ranks = _rank(np.array([5, 7, 9, 11, 13], dtype=np.int64))
    want = np.array([5, 7, 9, 11, 13], dtype=np.int64)[np.argsort(ranks)][:2]
    assert sorted(b_rows.doc_id.tolist()) == sorted(want.tolist())
    # partition invariance with the duplicates present
    out2 = stratified_sample(
        rd.from_arrow(t).repartition(5), "lang", 2
    ).to_pandas()
    assert sorted(map(tuple, out[["doc_id", "lang"]].to_numpy())) == sorted(
        map(tuple, out2[["doc_id", "lang"]].to_numpy())
    )


def test_weighted_hash_sample(ray_session):
    from raydedup.stages.sampling import weighted_hash_sample
    import pandas as pd

    n = 8000
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "w": pa.array((np.arange(n) % 9).astype(np.int64)),  # 0..8
        }
    )
    got = weighted_hash_sample(rd.from_arrow(t), "w", denom=8).to_pandas()
    # w=0 never kept, w=8 always kept
    assert (got.w > 0).all()
    full = t.to_pandas()
    assert set(full[full.w == 8].doc_id) <= set(got.doc_id)
    # per-weight keep rate within 5 sigma of w/8
    for w in range(1, 8):
        nk = (got.w == w).sum()
        nw = (full.w == w).sum()
        p = w / 8
        assert abs(nk - p * nw) < 5 * np.sqrt(p * (1 - p) * nw), (w, nk, nw)
    # partition invariance
    b = (
        weighted_hash_sample(rd.from_arrow(t).repartition(13), "w", denom=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id").reset_index(drop=True), b
    )
    # w = denom/2 is EXACTLY hash_sample(0.5): identical threshold
    half = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "w": pa.array(np.full(n, 4, dtype=np.int64)),
        }
    )
    a = weighted_hash_sample(rd.from_arrow(half), "w", denom=8).to_pandas()
    c = hash_sample(rd.from_arrow(half), 0.5).to_pandas()
    assert sorted(a.doc_id) == sorted(c.doc_id)


def test_weighted_hash_sample_validates(ray_session):
    from raydedup.stages.sampling import weighted_hash_sample
    import pytest as _pytest

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "w": pa.array([9, 1], pa.int64()),
        }
    )
    with _pytest.raises(Exception):
        weighted_hash_sample(rd.from_arrow(t), "w", denom=8).to_pandas()
