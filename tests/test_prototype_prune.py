"""Prototypicality pruning tests: naive-reference parity, planted
prototypical-vs-outlier behavior, partition invariance, single-member
labels."""

import numpy as np
import pyarrow as pa

from raydedup.stages.embsketch import prototype_prune


def _emb_ds(rd, vecs, labels, ids=None, parts=4):
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
            "label": pa.array(np.asarray(labels, dtype=np.int32), pa.int32()),
        }
    )
    ds = rd.from_arrow(t)
    return ds.repartition(parts) if parts else ds


def _naive(vecs, labels, tau):
    """Quantize-once centroid mean + cosine, the stage's exact rule."""
    q = np.floor(vecs.astype(np.float64) * (1 << 20)).astype(np.int64)
    out_cos = np.zeros(len(vecs))
    for lb in np.unique(labels):
        m = labels == lb
        cent = q[m].sum(axis=0) / (m.sum() * float(1 << 20))
        for i in np.flatnonzero(m):
            v = vecs[i].astype(np.float64)
            d = np.linalg.norm(v) * np.linalg.norm(cent)
            out_cos[i] = float(v @ cent) / d if d > 0 else 0.0
    return out_cos, (out_cos < tau).astype(np.int64)


def test_matches_naive_reference(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.PCG64(17))
    vecs = rng.normal(size=(80, 24)).astype(np.float32)
    labels = rng.integers(0, 5, size=80)
    df = (
        prototype_prune(_emb_ds(rd, vecs, labels), threshold=0.3)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    cos, keep = _naive(vecs, labels, 0.3)
    assert np.allclose(df["proto_cos"].to_numpy(), cos, atol=1e-12)
    assert (df["keep"].to_numpy() == keep).all()
    assert df["label"].tolist() == labels.astype(np.int64).tolist()


def test_prototypes_pruned_outliers_kept(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.PCG64(3))
    proto = rng.normal(size=24).astype(np.float32)
    # 20 near-copies of the prototype (cos -> 1) + 4 strong outliers
    members = np.vstack(
        [proto + rng.normal(scale=0.01, size=24).astype(np.float32) for _ in range(20)]
    )
    outliers = -np.vstack([proto] * 4) + rng.normal(scale=0.05, size=(4, 24)).astype(
        np.float32
    )
    vecs = np.vstack([members, outliers]).astype(np.float32)
    labels = np.zeros(24, dtype=np.int64)
    df = (
        prototype_prune(_emb_ds(rd, vecs, labels), threshold=0.5)
        .to_pandas().set_index("vec_id")
    )
    for i in range(20):
        assert df.loc[i, "keep"] == 0  # prototypical -> pruned
    for i in range(20, 24):
        assert df.loc[i, "keep"] == 1  # anti-aligned outliers -> kept


def test_partition_invariance(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.PCG64(9))
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    labels = rng.integers(0, 4, size=60)
    a = (
        prototype_prune(_emb_ds(rd, vecs, labels, parts=2))
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        prototype_prune(_emb_ds(rd, vecs, labels, parts=9))
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert a.equals(b)


def test_singleton_label_is_its_own_prototype(ray_session):
    import ray.data as rd

    rng = np.random.Generator(np.random.PCG64(1))
    vecs = rng.normal(size=(5, 8)).astype(np.float32)
    labels = np.arange(5)  # every vector alone in its label
    df = prototype_prune(_emb_ds(rd, vecs, labels), threshold=0.99).to_pandas()
    # cos(v, quantized-mean(v)) ~ 1 -> everything pruned at tau 0.99
    assert (df["keep"] == 0).all()
    assert (df["proto_cos"] > 0.99).all()
