"""ANN / embedding near-dup tests: cross-bucket recall, hot-bucket
skew, distributed centroid training determinism, batch-query API."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _emb_ds(rd, vecs: np.ndarray):
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(vecs.shape[0], dtype=np.int64)),
            "embedding": pa.array(
                [v.astype(np.float32).tolist() for v in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )
    return rd.from_arrow(t).repartition(4)


def _planted_corpus(n_clusters=40, dim=32, seed=9):
    """Well-separated cluster centers, each with one near-dup partner at
    cosine ~0.99 — pairs often straddle Voronoi boundaries of a coarse
    quantizer, which is exactly what multi-probe must recover."""
    rng = np.random.Generator(np.random.PCG64(seed))
    base = rng.normal(size=(n_clusters, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows, truth = [], []
    for i, c in enumerate(base):
        partner = c + 0.08 * rng.normal(size=dim)
        rows.append(c)
        rows.append(partner)
        truth.append((2 * i, 2 * i + 1))
    # noise vectors nowhere near the threshold
    noise = rng.normal(size=(200, dim)) * 3
    rows.extend(noise)
    return np.stack(rows), truth


def test_embedding_neardup_bucketed_recall(ray_session):
    import ray.data as rd

    from raydedup.stages.ann import embedding_neardup_bruteforce, embedding_neardup_pairs

    vecs, truth = _planted_corpus()
    ds = _emb_ds(rd, vecs)
    exact = embedding_neardup_bruteforce(ds, threshold=0.95)
    got = embedding_neardup_pairs(ds, threshold=0.95, n_probe=2)
    exact_set = set(zip(exact["a"], exact["b"]))
    got_set = set(zip(got["a"], got["b"]))
    assert got_set <= exact_set  # approximate must be a subset of exact
    planted = set(truth) & exact_set
    assert planted, "planted pairs must clear the threshold"
    recall = len(got_set & planted) / len(planted)
    assert recall >= 0.95, f"cross-bucket recall {recall:.2f}"


def test_embedding_neardup_hot_bucket_capped(ray_session):
    """A degenerate corpus (all vectors in one Voronoi cell) must
    complete via sub-bucketing instead of one O(n^2) group."""
    import ray.data as rd

    from raydedup.stages.ann import embedding_neardup_pairs

    rng = np.random.Generator(np.random.PCG64(3))
    base = rng.normal(size=32)
    # 1200 BYTE-IDENTICAL vectors: k-means cannot split them, so they
    # all land in one bucket (the degenerate hot-key case)
    vecs = np.tile(base, (1200, 1))
    ds = _emb_ds(rd, vecs)
    out = embedding_neardup_pairs(
        ds, threshold=2.0, n_centroids=8, n_probe=1, max_bucket=500
    )
    # the run completes via sub-bucketing (reported) without an O(n^2) group
    assert out.attrs.get("n_subbucketed") == 1
    assert len(out) == 0


def test_train_centroids_deterministic_vs_partitioning(ray_session):
    import ray.data as rd

    from raydedup.stages.ann import train_centroids

    rng = np.random.Generator(np.random.PCG64(5))
    vecs = rng.normal(size=(600, 16))
    a = train_centroids(_emb_ds(rd, vecs).repartition(2), n_centroids=16)
    b = train_centroids(_emb_ds(rd, vecs).repartition(11), n_centroids=16)
    # init selection must be identical regardless of block layout
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)


def test_ivf_and_lsh_recall_vs_exact(ray_session):
    """Approximate top-k must be a SUBSET of the exact candidate scores
    with measured recall: IVF@n_probe=4 and hyperplane-LSH must both
    find the true top-1 (a planted self-match) and >= 60% of the exact
    top-10 on a random corpus."""
    import ray.data as rd

    from raydedup.stages.ann import (
        knn_cosine_bruteforce,
        knn_cosine_ivf,
        knn_cosine_lsh,
    )

    rng = np.random.Generator(np.random.PCG64(21))
    vecs = rng.normal(size=(800, 24))
    # plant 9 TRUE near neighbours of vecs[123] at cosine ~0.99 — LSH
    # recall is only meaningful for genuinely similar vectors (random
    # Gaussian "top-10" are near-orthogonal and legitimately invisible
    # to sign-pattern buckets)
    for i in range(9):
        vecs[700 + i] = vecs[123] + 0.05 * rng.normal(size=24)
    ds = _emb_ds(rd, vecs)
    q = vecs[123]
    exact = knn_cosine_bruteforce(ds, q, k=10)
    exact_ids = set(exact["vec_id"])
    assert exact_ids == {123, *range(700, 709)}  # planted set IS the top-10
    for name, approx in (
        ("ivf", knn_cosine_ivf(ds, q, k=10, n_probe=4)),
        ("lsh", knn_cosine_lsh(ds, q, k=10)),
    ):
        got = set(approx["vec_id"])
        assert 123 in got, name  # self-match always recovered
        # approximate scores are true cosines: every returned id's score
        # must equal its exact score (subset-of-exact property)
        merged = approx.merge(exact, on="vec_id", suffixes=("_a", "_e"))
        if len(merged):
            np.testing.assert_allclose(
                merged["cosine_a"], merged["cosine_e"], rtol=0, atol=0
            )
        recall = len(got & exact_ids) / len(exact_ids)
        assert recall >= 0.8, (name, recall)


def test_knn_cosine_batch_matches_single(ray_session):
    import ray.data as rd

    from raydedup.stages.ann import knn_cosine_batch, knn_cosine_bruteforce

    rng = np.random.Generator(np.random.PCG64(7))
    vecs = rng.normal(size=(400, 24))
    ds = _emb_ds(rd, vecs)
    queries = vecs[[3, 77, 200]]
    batch = knn_cosine_batch(ds, queries, query_ids=np.array([3, 77, 200]), k=5)
    for q in (3, 77, 200):
        single = knn_cosine_bruteforce(ds, vecs[q], k=5)
        got = batch[batch["query_id"] == q]
        assert list(got["vec_id"]) == list(single["vec_id"])
        np.testing.assert_allclose(got["cosine"].to_numpy(), single["cosine"].to_numpy())


def test_embedding_stats_matches_duckdb_bitwise(ray_session):
    """Sequential (cumsum) reductions must bit-match DuckDB's list_sum
    fold on the same float32->float64 data; np.sum (pairwise) would
    differ at ~1e-15."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydedup.stages.ann import embedding_stats

    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((150, 40)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(150), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
        }
    )
    got = (
        embedding_stats(rd.from_arrow(tbl).repartition(4))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", tbl)
    import __ray_entry__ as entry

    want = con.execute(entry.oracle_sql()["embedding_stats"]).df()
    for c in ["vec_id", "dim", "l2_norm", "mean_val"]:
        assert (got[c].values == want[c].values).all(), c


def test_embedding_stats_zero_length_vectors(ray_session):
    """Zero-dim vectors are reported (dim=0, zeros), not crashed on."""
    import pyarrow as pa
    import ray.data as rd

    from raydedup.stages.ann import embedding_stats

    tbl = pa.table(
        {
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[], []], pa.list_(pa.float32())),
        }
    )
    got = embedding_stats(rd.from_arrow(tbl)).to_pandas().sort_values("vec_id")
    assert got.dim.tolist() == [0, 0]
    assert got.l2_norm.tolist() == [0.0, 0.0] and got.mean_val.tolist() == [0.0, 0.0]


def test_embedding_decontaminate_matches_naive(ray_session):
    import pandas as pd
    import ray.data as rd

    from raydedup.stages.ann import embedding_decontaminate

    rng = np.random.default_rng(11)
    dim = 8
    ev = pd.DataFrame(
        {
            "vec_id": np.arange(0, 12, dtype=np.int64),
            "embedding": list(rng.normal(size=(12, dim))),
        }
    )
    tr_m = rng.normal(size=(200, dim))
    # plant exact copies of eval vectors (cosine 1.0, must flag) and a
    # tie: train row equal to eval 3 AND eval 7 being identical vectors
    ev.at[7, "embedding"] = np.asarray(ev.at[3, "embedding"]).copy()
    tr_m[0] = ev.at[3, "embedding"]
    tr_m[1] = ev.at[5, "embedding"]
    tr = pd.DataFrame(
        {
            "vec_id": np.arange(100, 300, dtype=np.int64),
            # plain python lists -> Arrow list<double>, the parquet shape
            "embedding": [list(map(float, r)) for r in tr_m],
        }
    )
    out = (
        embedding_decontaminate(rd.from_pandas(tr).repartition(5), ev, 0.9)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )

    def norm(m):
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)

    em = norm(np.stack(ev["embedding"].to_numpy()))
    tm = norm(tr_m)
    sims = tm @ em.T
    best = sims.argmax(axis=1)
    assert (out["matched_eval_id"].to_numpy() == ev["vec_id"].to_numpy()[best]).all()
    np.testing.assert_allclose(
        out["max_cosine"].to_numpy(), sims[np.arange(200), best], rtol=0, atol=0
    )
    assert (out["flagged"].to_numpy() == (sims[np.arange(200), best] >= 0.9)).all()
    row0 = out.set_index("vec_id").loc[100]
    assert row0["matched_eval_id"] == 3 and row0["flagged"] == 1  # tie -> smaller id
    assert out.set_index("vec_id").loc[101, "matched_eval_id"] == 5


def test_knn_classify_matches_naive(ray_session):
    import ray.data as rd

    from raydedup.stages.ann import knn_classify

    rng = np.random.default_rng(19)
    n, dim = 300, 16
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 4, size=n).astype(np.int64)
    tbl = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": labels,
        }
    )
    corpus = rd.from_arrow(tbl).repartition(5)
    q_ids = np.array([1000, 1001, 1002], dtype=np.int64)
    queries = rng.normal(size=(3, dim)).astype(np.float64)
    out = knn_classify(corpus, queries, q_ids, k=7)
    # naive reference
    cn = vecs.astype(np.float64)
    cn = cn / np.linalg.norm(cn, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    sims = qn @ cn.T
    exp = []
    for i in range(3):
        order = np.lexsort((np.arange(n), -sims[i]))[:7]
        labs, counts = np.unique(labels[order], return_counts=True)
        best = labs[np.lexsort((labs, -counts))][0]
        exp.append(int(best))
    assert out.query_id.tolist() == q_ids.tolist()
    assert out.pred_label.tolist() == exp


def test_label_centroids_exact(ray_session):
    import ray.data as rd

    from raydedup.stages.embsketch import QUANT_SCALE, label_centroids

    rng = np.random.default_rng(23)
    n, dim = 200, 8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    labels = rng.integers(0, 3, size=n).astype(np.int32)
    tbl = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": labels,
        }
    )
    a = label_centroids(rd.from_arrow(tbl).repartition(1))
    b = label_centroids(rd.from_arrow(tbl).repartition(9))
    assert a.equals(b)  # partition invariance, bit-exact
    df = a.to_pandas()
    for lb in range(3):
        mask = labels == lb
        w = np.floor(vecs[mask].astype(np.float64) * QUANT_SCALE).astype(np.int64)
        exp = w.sum(axis=0) / (mask.sum() * QUANT_SCALE)
        got = df[df.label == lb].sort_values("j").centroid.to_numpy()
        assert np.array_equal(got, exp)
        # quantization error bound: within 2^-20 of the true mean
        true = vecs[mask].astype(np.float64).mean(axis=0)
        assert np.max(np.abs(got - true)) < 1.0 / (1 << 20) + 1e-12
