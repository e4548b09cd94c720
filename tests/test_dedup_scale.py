"""Driver-light pipeline (run_dedup_scale): same acceptance gates as
run_dedup with nothing corpus-proportional on the driver."""

import pandas as pd
import pytest

from raydedup.config import DedupConfig
from raydedup.metrics import evaluate_against_oracle
from raydedup.pipelines.dedup import run_dedup
from raydedup.pipelines.dedup_scale import run_dedup_scale
from raydedup.sources.pages import pages_to_docs, read_pages


@pytest.fixture(scope="module")
def both_runs(ray_session, small_corpus):
    spec, paths = small_corpus
    cfg = DedupConfig(batch_size=256)
    docs = pages_to_docs(read_pages(paths["pages"]))
    scale = run_dedup_scale(docs, cfg, containment=True, num_buckets=16, n_shards=3)
    std = run_dedup(pages_to_docs(read_pages(paths["pages"])), cfg, containment=True)
    return paths, scale, std


def test_scale_pipeline_oracle_gates(both_runs):
    paths, scale, std = both_runs
    cl = scale.clusters.to_pandas()
    rep = evaluate_against_oracle(cl, paths["oracle_clusters"], paths["oracle_pairs"])
    assert rep["recall"] >= 0.99
    assert rep["boilerplate_false_merges"] == 0
    assert rep["broken_singletons"] == 0


def test_scale_assignment_is_total_and_consistent(both_runs):
    paths, scale, std = both_runs
    cl = scale.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert cl.doc_id.is_unique
    # root convention: every cluster_id is itself assigned to that cluster
    roots = set(cl[cl.doc_id == cl.cluster_id].doc_id)
    assert set(cl.cluster_id).issubset(roots)
    # representative flag matches the id equality
    assert ((cl.doc_id == cl.cluster_id) == cl.is_representative).all()


def test_scale_matches_standard_on_exact_and_near(both_runs):
    """Same co-membership for pairs the standard pipeline links through
    exact + LSH edges (the two paths may differ only on containment
    scope, which the oracle gate already covers)."""
    paths, scale, std = both_runs
    s = scale.clusters.to_pandas()
    smap = dict(zip(s.doc_id, s.cluster_id))
    vp = std.verified_pairs.to_pandas()
    agree = sum(smap[a] == smap[b] for a, b in zip(vp.a, vp.b))
    assert agree == len(vp)
    ee = std.exact_edges.to_pandas()
    agree = sum(smap[a] == smap[b] for a, b in zip(ee.a, ee.b))
    assert agree == len(ee)


def test_scale_determinism(ray_session, small_corpus):
    spec, paths = small_corpus
    cfg = DedupConfig(batch_size=256)
    a = run_dedup_scale(
        pages_to_docs(read_pages(paths["pages"])), cfg, num_buckets=16, n_shards=3
    ).clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = run_dedup_scale(
        pages_to_docs(read_pages(paths["pages"])), cfg, num_buckets=8, n_shards=5
    ).clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_run_dedup_auto_routes_by_doc_count(both_runs, small_corpus):
    """run_dedup_auto: below scale_min_docs -> driver-assisted base path,
    at/above -> refs-only scale path; both report the route in metrics
    and the scale route stays cluster-equivalent on base's edges."""
    from raydedup.pipelines.dedup_scale import run_dedup_auto

    spec, paths = small_corpus
    _, scale, std = both_runs
    cfg = DedupConfig(batch_size=256)
    docs = pages_to_docs(read_pages(paths["pages"]))

    base_res = run_dedup_auto(docs, cfg, containment=True)
    assert base_res.metrics["dedup_path"] == "base"
    assert base_res.metrics["n_docs"] == spec.n_docs
    assert hasattr(base_res, "verified_pairs")  # native DedupResult

    scale_res = run_dedup_auto(
        docs, cfg.with_overrides(scale_min_docs=1), containment=True,
        num_buckets=16, n_shards=3,
    )
    assert scale_res.metrics["dedup_path"] == "scale"
    s = scale_res.clusters.to_pandas()
    smap = dict(zip(s.doc_id, s.cluster_id))
    vp = std.verified_pairs.to_pandas()
    assert all(smap[a] == smap[b] for a, b in zip(vp.a, vp.b))


def test_sig_skip_exact_members_is_cluster_identical(ray_session, small_corpus):
    """cfg.sig_skip_exact_members: exact-dup members get no signature
    (they reattach via sha edges), so clusters must be frame-identical
    to the default path while the raw LSH candidate volume drops."""
    spec, paths = small_corpus
    cfg = DedupConfig(batch_size=256)
    docs = pages_to_docs(read_pages(paths["pages"])).materialize()

    off = run_dedup_scale(docs, cfg, num_buckets=16, n_shards=3)
    on = run_dedup_scale(
        docs, cfg.with_overrides(sig_skip_exact_members=True),
        num_buckets=16, n_shards=3,
    )
    a = off.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = on.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # members produce no postings -> strictly fewer raw candidates
    # (the small_corpus plants exact-dup groups, so the drop is real)
    assert on.metrics["candidate_pairs"] < off.metrics["candidate_pairs"]


def test_sig_skip_honors_actor_pool_concurrency(ray_session, small_corpus):
    """signature_concurrency + sig_skip_exact_members must not silently
    fall back to stateless tasks (review finding): the actor-pool path
    applies the member drop as a separate filter stage and the clusters
    stay frame-identical."""
    spec, paths = small_corpus
    docs = pages_to_docs(read_pages(paths["pages"])).materialize()
    base = run_dedup_scale(
        docs, DedupConfig(batch_size=256), num_buckets=16, n_shards=3
    )
    pooled = run_dedup_scale(
        docs,
        DedupConfig(
            batch_size=256, sig_skip_exact_members=True, signature_concurrency=2
        ),
        num_buckets=16,
        n_shards=3,
    )
    a = base.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = pooled.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_stream_spill_phase1_is_cluster_identical(both_runs, tmp_path):
    """stream_spill_dir (VERDICT r4 #3): the streaming phase-1 variant
    (corpus cached once to disk-backed parquet, consumed lazily per
    stage) produces frame-identical clusters to the materialized path,
    and a second run REUSES the complete cache (marker contract)."""
    import os

    paths, scale, std = both_runs
    docs = pages_to_docs(read_pages(paths["pages"]))
    cfg = DedupConfig(batch_size=256)
    spill = str(tmp_path / "spill")
    got = run_dedup_scale(
        docs, cfg, containment=True, num_buckets=16, n_shards=3,
        stream_spill_dir=spill,
    )
    assert got.metrics["phase1_mode"] == "stream"
    a = got.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = scale.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # cache reuse: parquet files untouched by a second run
    import glob

    files = sorted(glob.glob(os.path.join(spill, "*.parquet")))
    assert files and os.path.exists(os.path.join(spill, "_SPILL_COMPLETE"))
    mtimes = [os.path.getmtime(f) for f in files]
    again = run_dedup_scale(
        docs, cfg, containment=True, num_buckets=16, n_shards=3,
        stream_spill_dir=spill,
    )
    pd.testing.assert_frame_equal(
        again.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True), b
    )
    assert [os.path.getmtime(f) for f in files] == mtimes


def test_run_dedup_auto_streams_above_threshold(ray_session, small_corpus, tmp_path):
    """run_dedup_auto threads cfg.stream_spill_dir into the scale path
    once the corpus crosses cfg.scale_stream_min_docs."""
    from raydedup.pipelines.dedup_scale import run_dedup_auto

    spec, paths = small_corpus
    docs = pages_to_docs(read_pages(paths["pages"]))
    spill = str(tmp_path / "autospill")
    cfg = DedupConfig(
        batch_size=256,
        scale_min_docs=1,
        scale_stream_min_docs=10,
        stream_spill_dir=spill,
    )
    res = run_dedup_auto(docs, cfg, containment=True, num_buckets=16, n_shards=3)
    assert res.metrics["dedup_path"] == "scale"
    assert res.metrics["phase1_mode"] == "stream"
    base = run_dedup_scale(
        pages_to_docs(read_pages(paths["pages"])),
        DedupConfig(batch_size=256),
        containment=True, num_buckets=16, n_shards=3,
    )
    pd.testing.assert_frame_equal(
        res.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True),
        base.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True),
    )
