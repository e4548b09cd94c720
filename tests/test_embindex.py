"""Persisted embedding ANN index (pipelines/embindex.py): build
manifest integrity, exact full-probe parity with the in-memory
reference, approximate-probe recall on clustered data, probe-pruned
reads (unprobed partitions are never opened), config guard, and
crash-rebuild idempotence."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.pipelines.embindex import (
    MANIFEST,
    build_emb_index,
    query_emb_index,
)


def _clustered(n_clusters=8, per=30, dim=24, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    centers = rng.normal(size=(n_clusters, dim)) * 6.0
    vecs, labels = [], []
    for c in range(n_clusters):
        vecs.append(centers[c] + rng.normal(scale=0.3, size=(per, dim)))
        labels += [c] * per
    m = np.vstack(vecs).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in m], pa.list_(pa.float32())),
        }
    )
    return t, m, np.array(labels)


def _build(tmp_path, t, **kw):
    d = str(tmp_path / "idx")
    man = build_emb_index(rd.from_arrow(t).repartition(4), d, **kw)
    return d, man


def test_build_manifest_and_layout(ray_session, tmp_path):
    t, m, _ = _clustered()
    d, man = _build(tmp_path, t, n_centroids=8)
    assert man["n_vectors"] == len(m)
    assert man["n_centroids"] == 8
    assert sum(man["bucket_counts"].values()) == len(m)
    assert os.path.exists(os.path.join(d, MANIFEST))
    assert os.path.exists(os.path.join(d, "centroids.parquet"))
    dirs = glob.glob(os.path.join(d, "vectors", "bucket=*"))
    assert len(dirs) == len(man["bucket_counts"])


def test_exact_full_probe_matches_reference(ray_session, tmp_path):
    from raydedup.stages.ann import knn_cosine_batch

    t, m, _ = _clustered(seed=9)
    d, _ = _build(tmp_path, t, n_centroids=8)
    Q = m[:15].astype(np.float64)
    qids = np.arange(15, dtype=np.int64)
    got = query_emb_index(d, Q, query_ids=qids, k=4, n_probe=None)
    ref = knn_cosine_batch(rd.from_arrow(t), Q, query_ids=qids, k=4).rename(
        columns={"query_id": "q"}
    )
    a = got.sort_values(["q", "rank"]).reset_index(drop=True)
    b = ref.sort_values(["q", "rank"]).reset_index(drop=True)
    assert a[["q", "vec_id", "rank"]].equals(b[["q", "vec_id", "rank"]])
    assert np.allclose(a["cosine"], b["cosine"], atol=1e-12)


def test_approx_probe_recall_on_clustered_data(ray_session, tmp_path):
    t, m, _ = _clustered(n_clusters=8, per=40, seed=3)
    d, _ = _build(tmp_path, t, n_centroids=8)
    Q = m[::16].astype(np.float64)
    qids = np.arange(0, len(m), 16, dtype=np.int64)
    exact = query_emb_index(d, Q, query_ids=qids, k=5, n_probe=None)
    approx = query_emb_index(d, Q, query_ids=qids, k=5, n_probe=2)
    want = set(map(tuple, exact[["q", "vec_id"]].values))
    got = set(map(tuple, approx[["q", "vec_id"]].values))
    assert len(got & want) / len(want) >= 0.9


def test_unprobed_partitions_never_read(ray_session, tmp_path):
    """Corrupt every partition OUTSIDE the probe set: the query must
    still succeed, proving the scan prunes at the partition level."""
    t, m, _ = _clustered(seed=11)
    d, man = _build(tmp_path, t, n_centroids=8)
    Q = m[:1].astype(np.float64)
    ok = query_emb_index(d, Q, k=3, n_probe=1)
    assert len(ok) == 3
    # find the single probed bucket, corrupt all others
    import pyarrow.parquet as pq

    from raydedup.pipelines.embindex import _load_centroids
    from raydedup.stages.ann import _normalize

    _, cents = _load_centroids(d)
    qn = _normalize(Q)
    probed = int(np.argmax(qn @ cents.T))
    for b in man["bucket_counts"]:
        if int(b) == probed:
            continue
        for f in glob.glob(os.path.join(d, "vectors", f"bucket={b}", "*.parquet")):
            with open(f, "wb") as fh:
                fh.write(b"not parquet at all")
    again = query_emb_index(d, Q, k=3, n_probe=1)
    assert again.equals(ok)
    with pytest.raises(Exception):
        # full probe MUST now fail: it has to open a corrupted partition
        query_emb_index(d, Q, k=3, n_probe=None).to_string()


def test_config_guard_and_crash_rebuild(ray_session, tmp_path):
    t, m, _ = _clustered(seed=7)
    d, man = _build(tmp_path, t, n_centroids=8)
    # same config: returns the existing manifest untouched
    man2 = build_emb_index(rd.from_arrow(t), d, n_centroids=8)
    assert man2 == man
    # different config: refuses
    with pytest.raises(FileExistsError):
        build_emb_index(rd.from_arrow(t), d, n_centroids=4)
    # crash before manifest: rebuild is idempotent (content-named parts)
    os.remove(os.path.join(d, MANIFEST))
    man3 = build_emb_index(rd.from_arrow(t).repartition(4), d, n_centroids=8)
    assert man3["bucket_counts"] == man["bucket_counts"]
    Q = m[:5].astype(np.float64)
    got = query_emb_index(d, Q, k=3, n_probe=None)
    assert len(got) == 15


def test_add_shard_frozen_centroids(ray_session, tmp_path):
    """add_to_emb_index: frozen-centroid fold — the folded index's
    exact search equals brute force over the UNION; re-folding the same
    shard is a no-op (anti-join on present ids); manifest counts stay
    exact."""
    from raydedup.pipelines.embindex import add_to_emb_index
    from raydedup.stages.ann import knn_cosine_batch

    t, m, _ = _clustered(n_clusters=6, per=20, seed=21)
    d, man0 = _build(tmp_path, t, n_centroids=6)

    rng = np.random.Generator(np.random.PCG64(77))
    new = rng.normal(size=(50, m.shape[1])).astype(np.float32)
    nt = pa.table(
        {
            "vec_id": pa.array(np.arange(5000, 5050, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in new], pa.list_(pa.float32())),
        }
    )
    info = add_to_emb_index(d, rd.from_arrow(nt).repartition(3))
    assert info["added"] == 50 and info["skipped"] == 0
    assert info["n_vectors"] == man0["n_vectors"] + 50

    # exact search over the folded index == brute force over the union
    union = pa.concat_tables([t, nt])
    Q = np.vstack([m[:5], new[:5]]).astype(np.float64)
    qids = np.arange(10, dtype=np.int64)
    got = query_emb_index(d, Q, query_ids=qids, k=4, n_probe=None)
    ref = knn_cosine_batch(rd.from_arrow(union), Q, query_ids=qids, k=4).rename(
        columns={"query_id": "q"}
    )
    a = got.sort_values(["q", "rank"]).reset_index(drop=True)
    b = ref.sort_values(["q", "rank"]).reset_index(drop=True)
    assert a[["q", "vec_id", "rank"]].equals(b[["q", "vec_id", "rank"]])

    # idempotent re-fold: every id already present
    again = add_to_emb_index(d, rd.from_arrow(nt))
    assert again["added"] == 0 and again["skipped"] == 50
    assert again["n_vectors"] == info["n_vectors"]
    man = json.load(open(os.path.join(d, MANIFEST)))
    assert sum(man["bucket_counts"].values()) == info["n_vectors"]


def test_compact_merges_parts_and_preserves_results(ray_session, tmp_path):
    """After several folds a bucket holds many parts; compaction merges
    each to ONE file and query results are unchanged (including counts
    after a simulated crash that left merged+source files together)."""
    from raydedup.pipelines.embindex import add_to_emb_index, compact_emb_index

    t, m, _ = _clustered(n_clusters=4, per=15, seed=31)
    d, _ = _build(tmp_path, t, n_centroids=4)
    rng = np.random.Generator(np.random.PCG64(8))
    for wave in range(3):
        new = rng.normal(size=(20, m.shape[1])).astype(np.float32)
        nt = pa.table(
            {
                "vec_id": pa.array(
                    np.arange(9000 + 20 * wave, 9020 + 20 * wave, dtype=np.int64)
                ),
                "embedding": pa.array(
                    [v.tolist() for v in new], pa.list_(pa.float32())
                ),
            }
        )
        add_to_emb_index(d, rd.from_arrow(nt))
    Q = m[:6].astype(np.float64)
    before = query_emb_index(d, Q, k=4, n_probe=None)
    multi = [
        p for p in glob.glob(os.path.join(d, "vectors", "bucket=*"))
        if len(glob.glob(os.path.join(p, "*.parquet"))) > 1
    ]
    assert multi, "folds must have created multi-part buckets"
    info = compact_emb_index(d)
    assert info["buckets_compacted"] == len(multi)
    for p in glob.glob(os.path.join(d, "vectors", "bucket=*")):
        assert len(glob.glob(os.path.join(p, "*.parquet"))) == 1
    after = query_emb_index(d, Q, k=4, n_probe=None)
    assert after.equals(before)
    # idempotent: second compaction is a no-op
    again = compact_emb_index(d)
    assert again["buckets_compacted"] == 0


def test_tie_break_at_k_boundary_is_exact(ray_session, tmp_path):
    """Exact-duplicate vectors tied at the k-boundary must resolve by
    smallest vec_id regardless of partition layout (tie-safe local
    top-k, review finding)."""
    from raydedup.stages.ann import knn_cosine_batch

    rng = np.random.Generator(np.random.PCG64(13))
    base = rng.normal(size=(10, 16)).astype(np.float32)
    v = rng.normal(size=16).astype(np.float32)
    # ids 100..105 all hold the IDENTICAL vector v (cosine 1.0 to v)
    vecs = np.vstack([base, np.tile(v, (6, 1))])
    ids = np.r_[np.arange(10), np.arange(100, 106)]
    t = pa.table(
        {
            "vec_id": pa.array(ids.astype(np.int64)),
            "embedding": pa.array([x.tolist() for x in vecs], pa.list_(pa.float32())),
        }
    )
    d = str(tmp_path / "tieidx")
    build_emb_index(rd.from_arrow(t).repartition(6), d, n_centroids=4)
    for parts in (1, 3, 7):
        build = rd.from_arrow(t).repartition(parts)
        got = query_emb_index(d, v.reshape(1, -1).astype(np.float64), k=3, n_probe=None)
        # the three smallest tied ids win, in id order
        assert got["vec_id"].tolist() == [100, 101, 102], got
        ref = knn_cosine_batch(build, v.reshape(1, -1).astype(np.float64), k=3)
        assert ref["vec_id"].tolist() == [100, 101, 102], ref


def test_empty_query_array(ray_session, tmp_path):
    t, m, _ = _clustered(seed=2)
    d, _ = _build(tmp_path, t, n_centroids=4)
    out = query_emb_index(d, np.empty((0, m.shape[1])), k=3)
    assert len(out) == 0
    assert list(out.columns) == ["q", "vec_id", "cosine", "rank"]


def test_fold_crash_heals_manifest_counts(ray_session, tmp_path):
    """A fold that crashed before its manifest write leaves live parts;
    re-running the SAME fold re-derives touched-bucket counts from disk
    (no permanent undercount), and compaction repairs the whole index."""
    from raydedup.pipelines.embindex import add_to_emb_index, compact_emb_index

    t, m, _ = _clustered(n_clusters=4, per=10, seed=41)
    d, man0 = _build(tmp_path, t, n_centroids=4)
    rng = np.random.Generator(np.random.PCG64(6))
    new = rng.normal(size=(12, m.shape[1])).astype(np.float32)
    nt = pa.table(
        {
            "vec_id": pa.array(np.arange(7000, 7012, dtype=np.int64)),
            "embedding": pa.array([v.tolist() for v in new], pa.list_(pa.float32())),
        }
    )
    # simulate the crash: run the fold, then restore the OLD manifest
    # (parts live, counts stale)
    man_path = os.path.join(d, MANIFEST)
    old_manifest = open(man_path).read()
    add_to_emb_index(d, rd.from_arrow(nt))
    with open(man_path, "w") as f:
        f.write(old_manifest)
    # re-running the same fold: adds nothing, but heals the counts
    info = add_to_emb_index(d, rd.from_arrow(nt))
    assert info["added"] == 0 and info["skipped"] == 12
    assert info["n_vectors"] == man0["n_vectors"] + 12
    # and compaction independently re-derives the full manifest
    with open(man_path, "w") as f:
        f.write(old_manifest)
    cinfo = compact_emb_index(d)
    assert cinfo["n_vectors"] == man0["n_vectors"] + 12


def test_duplicate_ids_within_shard_deduped(ray_session, tmp_path):
    from raydedup.pipelines.embindex import add_to_emb_index

    t, m, _ = _clustered(n_clusters=4, per=10, seed=51)
    d, man0 = _build(tmp_path, t, n_centroids=4)
    rng = np.random.Generator(np.random.PCG64(4))
    v = rng.normal(size=(1, m.shape[1])).astype(np.float32)
    nt = pa.table(
        {
            "vec_id": pa.array(np.array([8000, 8000], dtype=np.int64)),
            "embedding": pa.array(
                [v[0].tolist(), v[0].tolist()], pa.list_(pa.float32())
            ),
        }
    )
    info = add_to_emb_index(d, rd.from_arrow(nt))
    assert info["added"] == 1
    assert info["n_vectors"] == man0["n_vectors"] + 1
    got = query_emb_index(d, v.astype(np.float64), k=2, n_probe=None)
    assert got["vec_id"].tolist()[0] == 8000
    assert (got["vec_id"] == 8000).sum() == 1  # stored once


def test_delete_from_index(ray_session, tmp_path):
    """delete: removed ids vanish from queries, untouched partitions'
    files stay byte-identical, manifest counts re-derive from disk,
    unknown ids are a no-op, and deleting a whole partition drops its
    dir."""
    from raydedup.pipelines.embindex import delete_from_emb_index
    from raydedup.stages.ann import knn_cosine_batch

    t, m, _ = _clustered(n_clusters=5, per=12, seed=61)
    d, man0 = _build(tmp_path, t, n_centroids=5)
    # target ids 0..4 plus an unknown id
    info = delete_from_emb_index(d, [0, 1, 2, 3, 4, 999999])
    assert info["deleted"] == 5
    assert info["n_vectors"] == man0["n_vectors"] - 5
    Q = m[:3].astype(np.float64)
    got = query_emb_index(d, Q, k=60, n_probe=None)
    assert not set(got["vec_id"]) & {0, 1, 2, 3, 4}
    # remaining rows match brute force over the surviving table
    keep_t = t.filter(pa.array(~np.isin(np.arange(len(m)), [0, 1, 2, 3, 4])))
    ref = knn_cosine_batch(rd.from_arrow(keep_t), Q, k=60).rename(
        columns={"query_id": "q"}
    )
    a = got.sort_values(["q", "rank"]).reset_index(drop=True)
    b = ref.sort_values(["q", "rank"]).reset_index(drop=True)
    assert a[["q", "vec_id", "rank"]].equals(b[["q", "vec_id", "rank"]])
    # no-op delete of already-gone ids
    again = delete_from_emb_index(d, [0, 1])
    assert again["deleted"] == 0
    assert again["n_vectors"] == info["n_vectors"]
    man = json.load(open(os.path.join(d, MANIFEST)))
    assert sum(man["bucket_counts"].values()) == info["n_vectors"]



def test_delete_rerun_after_partial_crash_converges(ray_session, tmp_path):
    """Simulated crash between part rewrite and source unlink (both
    files on disk): a re-run dedups survivors instead of double-
    counting them (review finding)."""
    import glob as g
    import shutil

    import pyarrow.parquet as pq

    from raydedup.pipelines.embindex import delete_from_emb_index

    t, m, _ = _clustered(n_clusters=3, per=10, seed=71)
    d, man0 = _build(tmp_path, t, n_centroids=3)
    # pick a bucket with >= 3 rows, duplicate its part file (the crash
    # artifact: rewritten part + original both present)
    bdir = max(
        g.glob(os.path.join(d, "vectors", "bucket=*")),
        key=lambda p: pq.read_metadata(g.glob(os.path.join(p, "*.parquet"))[0]).num_rows,
    )
    src = g.glob(os.path.join(bdir, "*.parquet"))[0]
    shutil.copy(src, src.replace("part-", "part-deadbeef"))
    # delete one id from that bucket
    victim = int(pq.read_table(src, columns=["vec_id"]).column("vec_id")[0].as_py())
    info = delete_from_emb_index(d, [victim])
    assert info["n_vectors"] == man0["n_vectors"] - 1
    man = json.load(open(os.path.join(d, MANIFEST)))
    # disk truth: every surviving id exactly once
    ids = []
    for f in g.glob(os.path.join(d, "vectors", "bucket=*", "*.parquet")):
        ids += pq.read_table(f, columns=["vec_id"]).column("vec_id").to_pylist()
    assert len(ids) == len(set(ids)) == man["n_vectors"] == man0["n_vectors"] - 1
