"""Embedding-SimHash tests: naive-reference sketch parity, partition
invariance, pigeonhole recall of the banded pair path vs brute force,
first-band dedupe, and empty input."""

import numpy as np
import pyarrow as pa

from raydedup.stages.embsketch import (
    DEFAULT_SEED,
    QUANT_SCALE,
    _sign_matrix,
    sketch_kernel,
)


def _emb_ds(rd, vecs: np.ndarray, parts: int = 4):
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(vecs.shape[0], dtype=np.int64)),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts else ds


def _naive_sketch(v: np.ndarray, seed: int = DEFAULT_SEED) -> int:
    s = _sign_matrix(64, v.shape[0], seed)
    w = [int(np.floor(float(np.float64(x)) * QUANT_SCALE)) for x in v]
    bits = 0
    for i in range(64):
        if sum(int(s[i][j]) * w[j] for j in range(len(w))) >= 0:
            bits |= 1 << i
    return bits


def _corpus(n=120, dim=48, seed=3):
    """Random vectors plus planted near-copies (one component negated)
    so Hamming<=3 pairs exist."""
    rng = np.random.Generator(np.random.PCG64(seed))
    base = rng.normal(size=(n, dim)).astype(np.float32)
    twins = base[::5].copy()
    for r in range(twins.shape[0]):
        twins[r, (5 * r) % dim] *= -1
    return np.vstack([base, twins])


def test_sketch_matches_naive_reference():
    vecs = _corpus(n=20, dim=16)
    got = sketch_kernel(vecs)
    for r in range(vecs.shape[0]):
        assert int(got[r]) == _naive_sketch(vecs[r])


def test_sketch_partition_invariance(ray_session):
    import ray.data as rd

    from raydedup.stages.embsketch import embedding_simhash

    vecs = _corpus()
    one = (
        embedding_simhash(_emb_ds(rd, vecs, parts=0))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    many = (
        embedding_simhash(_emb_ds(rd, vecs, parts=7))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert one.equals(many)


def test_banded_pairs_match_bruteforce(ray_session):
    """Pigeonhole: at max_hamming <= n_bands - 1 every qualifying pair
    shares a band, so the banded result EQUALS brute force (pairs and
    distances), with no duplicate emissions across bands."""
    import ray.data as rd

    from raydedup.stages.embsketch import embedding_neardup_simhash

    vecs = _corpus()
    sk = sketch_kernel(vecs)
    x = sk[:, None] ^ sk[None, :]
    ham = (
        np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1)
        .sum(axis=1)
        .reshape(x.shape)
    )
    iu, ju = np.triu_indices(len(sk), 1)
    keep = ham[iu, ju] <= 3
    expect = sorted(zip(iu[keep].tolist(), ju[keep].tolist(), ham[iu, ju][keep].tolist()))
    assert expect, "corpus must contain hamming<=3 pairs"

    got_df = embedding_neardup_simhash(_emb_ds(rd, vecs), max_hamming=3, n_bands=4)
    got = sorted(map(tuple, got_df[["a", "b", "hamming"]].values.tolist()))
    assert got == expect
    assert not got_df.duplicated(["a", "b"]).any()


def test_bands_must_exceed_hamming(ray_session):
    import pytest
    import ray.data as rd

    from raydedup.stages.embsketch import embedding_neardup_simhash

    with pytest.raises(ValueError):
        embedding_neardup_simhash(
            _emb_ds(rd, _corpus(n=10)), max_hamming=4, n_bands=4
        )


def test_empty_input(ray_session):
    import ray.data as rd

    from raydedup.stages.embsketch import embedding_neardup_simhash

    df = embedding_neardup_simhash(
        _emb_ds(rd, np.empty((0, 8), dtype=np.float32), parts=0)
    )
    assert list(df.columns) == ["a", "b", "hamming"] and len(df) == 0
