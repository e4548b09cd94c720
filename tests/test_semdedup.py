"""SemDeDup tests: planted exact/near copies pruned with min-id dup_of,
n_bucket_bits=0 equals the global (unbucketed) rule vs a naive
reference, bucket confinement, partition invariance, determinism,
near-copy recall of the bucketed rule, and empty input."""

import numpy as np
import pyarrow as pa

from raydedup.stages.ann import _normalize
from raydedup.stages.semdedup import semdedup as _semdedup_ds


def semdedup(ds, **kw):
    """Test shim: collect the Dataset result into the sorted frame the
    assertions below consume."""
    df = _semdedup_ds(ds, **kw).to_pandas()
    if "vec_id" not in df.columns:  # fully-empty input loses the schema
        import pandas as pd

        df = pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in ("vec_id", "bucket", "keep", "dup_of")}
        )
    return df.sort_values("vec_id").reset_index(drop=True)


def _emb_ds(rd, vecs: np.ndarray, ids=None, parts: int = 4):
    n = vecs.shape[0]
    if ids is None:
        ids = np.arange(n, dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts else ds


def _naive_global(vecs: np.ndarray, ids: np.ndarray, tau: float):
    """The unbucketed keep rule: pruned iff an earlier (smaller-id)
    vector is within cosine >= tau; dup_of = smallest such id."""
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    mn = _normalize(vecs.astype(np.float64))
    keep, dup_of = {}, {}
    for i in range(len(ids)):
        hit = [int(ids[j]) for j in range(i) if float(mn[i] @ mn[j]) >= tau]
        keep[int(ids[i])] = 0 if hit else 1
        dup_of[int(ids[i])] = min(hit) if hit else -1
    return keep, dup_of


def _corpus(n=80, dim=32, seed=7):
    rng = np.random.Generator(np.random.PCG64(seed))
    base = rng.normal(size=(n, dim)).astype(np.float32)
    return base


def test_exact_copies_pruned_min_id(ray_session):
    import ray.data as rd

    vecs = _corpus(n=20)
    # ids 100/101/102 are byte-identical to id 3 -> identical sketch,
    # same bucket at ANY bit width, pruned with dup_of=3
    dup = np.vstack([vecs, vecs[3], vecs[3], vecs[3]])
    ids = np.r_[np.arange(20), [100, 101, 102]]
    df = semdedup(_emb_ds(rd, dup, ids), threshold=0.95, n_bucket_bits=6)
    out = df.set_index("vec_id")
    for v in (100, 101, 102):
        assert out.loc[v, "keep"] == 0
        assert out.loc[v, "dup_of"] == 3
    assert out.loc[3, "keep"] == 1 and out.loc[3, "dup_of"] == -1
    # buckets of identical vectors identical
    assert out.loc[100, "bucket"] == out.loc[3, "bucket"]


def test_zero_bits_matches_naive_global_rule(ray_session):
    import ray.data as rd

    vecs = _corpus(n=60, dim=16, seed=11)
    # low dim + moderate tau so real (non-planted) prunes occur
    ids = np.arange(60, dtype=np.int64)
    df = semdedup(_emb_ds(rd, vecs, ids), threshold=0.5, n_bucket_bits=0)
    keep, dup_of = _naive_global(vecs, ids, 0.5)
    assert (df["bucket"] == 0).all()
    assert int((df["keep"] == 0).sum()) > 0, "corpus should have prunes"
    for _, r in df.iterrows():
        assert keep[int(r["vec_id"])] == int(r["keep"])
        assert dup_of[int(r["vec_id"])] == int(r["dup_of"])


def test_bucket_confinement_and_recall(ray_session):
    import ray.data as rd

    """Bucketed prunes are a subset of global prunes (confinement), and
    near-EXACT copies (cos ~ 1) are never lost to bucketing."""
    vecs = _corpus(n=100, dim=32, seed=13)
    twins = vecs[::10] + np.float32(1e-4)  # cos ~ 1.0 near-copies
    allv = np.vstack([vecs, twins])
    ids = np.r_[np.arange(100), 1000 + 10 * np.arange(10)]
    ds = _emb_ds(rd, allv, ids)
    g = semdedup(ds, threshold=0.9, n_bucket_bits=0).set_index("vec_id")
    b = semdedup(ds, threshold=0.9, n_bucket_bits=4).set_index("vec_id")
    pruned_b = set(b.index[b["keep"] == 0])
    pruned_g = set(g.index[g["keep"] == 0])
    assert pruned_b <= pruned_g
    # planted near-copies: sketches differ by ~0 bits, so recall holds
    twin_ids = set(1000 + 10 * np.arange(10))
    assert twin_ids <= pruned_b
    for t in twin_ids:
        assert b.loc[t, "dup_of"] == t - 1000


def test_partition_invariance_and_determinism(ray_session):
    import ray.data as rd

    vecs = _corpus(n=64, dim=24, seed=5)
    a = semdedup(_emb_ds(rd, vecs, parts=2), threshold=0.5, n_bucket_bits=3)
    bb = semdedup(_emb_ds(rd, vecs, parts=9), threshold=0.5, n_bucket_bits=3)
    c = semdedup(_emb_ds(rd, vecs, parts=2), threshold=0.5, n_bucket_bits=3)
    assert a.equals(bb)
    assert a.equals(c)


def test_empty_input(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
        }
    )
    df = semdedup(rd.from_arrow(t))
    assert list(df.columns) == ["vec_id", "bucket", "keep", "dup_of"]
    assert len(df) == 0
