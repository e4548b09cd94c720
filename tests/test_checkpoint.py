"""Checkpoint/resume tests: kill-and-resume must reproduce the clusters
of an uninterrupted run exactly (the north-rule resumability gate;
analog of the .tdb cache + `panako load` path,
``OlafStrategy.java:623-664``)."""

import glob
import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from raydedup.config import DedupConfig
from raydedup.state.checkpoint import CheckpointManager, run_dedup_checkpointed


def _pages_files(paths):
    return sorted(glob.glob(os.path.join(paths["pages"], "*.parquet")))


def _clusters_df(result) -> pd.DataFrame:
    files = sorted(glob.glob(os.path.join(result["clusters_path"], "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files])
    return df.sort_values("doc_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def cfg():
    return DedupConfig(batch_size=256)


def test_uninterrupted_vs_killed_and_resumed(ray_session, small_corpus, tmp_path, cfg):
    spec, paths = small_corpus
    files = _pages_files(paths)
    assert len(files) >= 4

    # uninterrupted reference run
    full = run_dedup_checkpointed(files, str(tmp_path / "full"), cfg)
    assert full is not None
    ref = _clusters_df(full)
    assert len(ref) == spec.n_docs

    # killed run: only 2 shards complete, then "crash"
    kdir = str(tmp_path / "killed")
    partial = run_dedup_checkpointed(files, kdir, cfg, max_shards=2)
    assert partial is None
    manifest = json.load(open(os.path.join(kdir, "manifest.json")))
    assert sum(1 for s in manifest["shards"].values() if s["status"] == "done") == 2

    # resume: remaining shards + global stages
    resumed = run_dedup_checkpointed(files, kdir, cfg)
    assert resumed is not None
    assert resumed["metrics"]["resumed_shards"] == 2
    got = _clusters_df(resumed)
    pd.testing.assert_frame_equal(got, ref)


def test_resume_skips_completed_stages(ray_session, small_corpus, tmp_path, cfg):
    spec, paths = small_corpus
    files = _pages_files(paths)
    d = str(tmp_path / "rerun")
    first = run_dedup_checkpointed(files, d, cfg)
    m1 = json.load(open(os.path.join(d, "manifest.json")))
    # second invocation must be a no-op (same manifest timestamps)
    second = run_dedup_checkpointed(files, d, cfg)
    m2 = json.load(open(os.path.join(d, "manifest.json")))
    assert m1 == m2
    pd.testing.assert_frame_equal(_clusters_df(first), _clusters_df(second))


def test_resume_with_changed_input_set_preserves_done_shards(
    ray_session, small_corpus, tmp_path, cfg
):
    """ADVICE r1: shard parquet names must derive from the shard KEY, not
    the position in the sorted file list — interrupting a run and then
    adding an input file that sorts first must not overwrite a done
    shard's parquet while it stays marked done."""
    import shutil

    spec, paths = small_corpus
    files = _pages_files(paths)
    work = tmp_path / "inputs"
    work.mkdir()
    for f in files:
        shutil.copy(f, work / os.path.basename(f))
    cur = sorted(glob.glob(str(work / "*.parquet")))

    d = str(tmp_path / "ck")
    partial = run_dedup_checkpointed(cur, d, cfg, max_shards=2)
    assert partial is None
    docs_before = {
        os.path.basename(p): os.path.getsize(p)
        for p in glob.glob(os.path.join(d, "docs", "*.parquet"))
    }

    # an extra input that sorts BEFORE every existing shard shifts all
    # positional indices; key-derived names must be unaffected
    shutil.copy(cur[0], work / "0000_added.parquet")
    resumed = run_dedup_checkpointed(sorted(glob.glob(str(work / "*.parquet"))), d, cfg)
    assert resumed is not None
    for name, size in docs_before.items():
        p = os.path.join(d, "docs", name)
        assert os.path.exists(p) and os.path.getsize(p) == size, name

    # every input doc is present exactly once per source row
    total = sum(
        pq.read_table(p).num_rows for p in glob.glob(os.path.join(d, "docs", "*.parquet"))
    )
    src = sum(pq.read_table(f).num_rows for f in sorted(glob.glob(str(work / "*.parquet"))))
    assert total == src


def test_config_change_invalidates_lineage(tmp_path, cfg):
    mgr = CheckpointManager(str(tmp_path / "c"), cfg)
    mgr.mark_shard("x:1", shard=0)
    assert CheckpointManager(str(tmp_path / "c"), cfg).shard_done("x:1")
    other = cfg.with_overrides(jaccard_tau=0.9)
    assert not CheckpointManager(str(tmp_path / "c"), other).shard_done("x:1")


def test_checkpointed_scale_mode(ray_session, small_corpus, tmp_path, cfg):
    """mode='scale' routes phase 2 through the refs-only pipeline:
    clusters identical to a direct run_dedup_scale, single
    'scale_clusters' stage in the manifest, re-invocation a no-op —
    and mode='auto' with a tiny threshold picks the same route."""
    from raydedup.pipelines.dedup_scale import run_dedup_scale
    from raydedup.sources.pages import pages_to_docs, read_pages

    spec, paths = small_corpus
    files = _pages_files(paths)
    d = str(tmp_path / "scale")
    out = run_dedup_checkpointed(files, d, cfg, mode="scale")
    assert out is not None and out["components_path"] is None
    assert out["metrics"]["dedup_path"] == "scale"
    manifest = json.load(open(os.path.join(d, "manifest.json")))
    assert set(manifest["stages"]) == {"scale_clusters"}
    got = _clusters_df(out)

    direct = run_dedup_scale(
        pages_to_docs(read_pages(paths["pages"])), cfg, containment=True
    ).clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[direct.columns], direct)

    # re-invocation: no-op (stage marked done)
    again = run_dedup_checkpointed(files, d, cfg, mode="scale")
    m2 = json.load(open(os.path.join(d, "manifest.json")))
    assert manifest == m2
    pd.testing.assert_frame_equal(_clusters_df(again), got)

    # auto + tiny threshold -> same scale route from a fresh dir
    cfg_auto = cfg.with_overrides(scale_min_docs=1)
    d2 = str(tmp_path / "auto")
    out2 = run_dedup_checkpointed(files, d2, cfg_auto, mode="auto")
    assert out2["metrics"]["dedup_path"] == "scale"
    pd.testing.assert_frame_equal(_clusters_df(out2), got)


def test_exchange_checkpoint_roundtrip(ray_session, tmp_path, cfg):
    """ExchangeCheckpoint.run computes once, persists per-bucket parquet
    with manifest rows, and loads (never recomputes) on the next run;
    a config change invalidates the lineage like every other artifact."""
    import pyarrow as pa
    import ray

    from raydedup.state.checkpoint import ExchangeCheckpoint

    mgr = CheckpointManager(str(tmp_path / "x"), cfg)
    exch = ExchangeCheckpoint(mgr)
    calls = []

    def thunk():
        calls.append(1)
        return [
            ray.put(pa.table({"a": pa.array([1, 2], pa.int64())})),
            ray.put(pa.table({})),  # 0-column empty (schema-less bucket)
        ]

    exch.run("s1", thunk)
    assert calls == [1] and exch.done("s1") and exch.stage_rows("s1") == 2

    exch2 = ExchangeCheckpoint(CheckpointManager(str(tmp_path / "x"), cfg))
    refs2 = exch2.run("s1", thunk)
    assert calls == [1]  # loaded, not recomputed
    tbls = ray.get(refs2)
    assert tbls[0].column("a").to_pylist() == [1, 2]
    assert tbls[1].num_rows == 0
    assert exch2.loaded_stages == ["s1"]

    other = ExchangeCheckpoint(
        CheckpointManager(str(tmp_path / "x"), cfg.with_overrides(jaccard_tau=0.9))
    )
    assert not other.done("s1")


def test_exchange_checkpoint_input_change_invalidates(ray_session, tmp_path, cfg):
    """A done exchange stage is reused only while the run's input
    fingerprint matches the recorded one: resuming after shards were
    ADDED must re-run the stage instead of silently serving stale
    buckets (advisory r4) — including over legacy pre-fingerprint
    entries, which invalidate too."""
    import pyarrow as pa
    import ray

    from raydedup.state.checkpoint import ExchangeCheckpoint

    mgr = CheckpointManager(str(tmp_path / "fp"), cfg)
    exch = ExchangeCheckpoint(mgr)
    exch.input_fp = "n_docs=10"
    calls = []

    def thunk():
        calls.append(1)
        return [ray.put(pa.table({"a": pa.array([len(calls)], pa.int64())}))]

    exch.run("s1", thunk)
    assert calls == [1]

    # same fingerprint -> loaded, not recomputed
    e2 = ExchangeCheckpoint(CheckpointManager(str(tmp_path / "fp"), cfg))
    e2.input_fp = "n_docs=10"
    refs = e2.run("s1", thunk)
    assert calls == [1] and e2.loaded_stages == ["s1"]
    assert ray.get(refs[0]).column("a").to_pylist() == [1]

    # grown corpus -> invalidated + recomputed, new result persisted
    e3 = ExchangeCheckpoint(CheckpointManager(str(tmp_path / "fp"), cfg))
    e3.input_fp = "n_docs=12"
    refs = e3.run("s1", thunk)
    assert calls == [1, 1] and e3.invalidated_stages == ["s1"]
    assert ray.get(refs[0]).column("a").to_pylist() == [2]
    assert e3.stage_rows("s1") == 1

    # legacy entry with NO recorded fingerprint also invalidates
    legacy = ExchangeCheckpoint(CheckpointManager(str(tmp_path / "fp"), cfg))
    del legacy.mgr.manifest["exchanges"]["s1"]["input_fp"]
    legacy.input_fp = "n_docs=12"
    legacy.run("s1", thunk)
    assert calls == [1, 1, 1] and legacy.invalidated_stages == ["s1"]


def test_scale_resume_skips_finished_exchanges(
    ray_session, small_corpus, tmp_path, cfg, monkeypatch
):
    """VERDICT r3 #1: kill mid-phase-2 (right after the candidate
    exchange commits), resume, and complete WITHOUT re-running the
    finished exchanges — their kernels are poisoned during the resume,
    so any replay fails the test — with clusters identical to a direct
    uninterrupted run_dedup_scale."""
    from raydedup.pipelines.dedup_scale import run_dedup_scale
    from raydedup.sources.pages import pages_to_docs, read_pages
    from raydedup.state.checkpoint import CheckpointKilled

    spec, paths = small_corpus
    files = _pages_files(paths)
    d = str(tmp_path / "killsc")

    with pytest.raises(CheckpointKilled):
        run_dedup_checkpointed(
            files, d, cfg, mode="scale", fail_after_stage="candidates"
        )
    manifest = json.load(open(os.path.join(d, "manifest.json")))
    ex = manifest["exchanges"]
    assert ex["exact"]["status"] == "done"
    assert ex["candidates"]["status"] == "done"
    assert "verified" not in ex
    assert "scale_clusters" not in manifest["stages"]
    # per-bucket files + manifest rows exist for the committed stages
    import glob as _g

    n_files = len(_g.glob(os.path.join(d, "exchanges", "candidates", "*.parquet")))
    assert n_files == ex["candidates"]["n_buckets"] > 0
    assert len(ex["candidates"]["buckets"]) == n_files

    # poison the finished exchanges' kernels: resume must never call them
    import raydedup.pipelines.dedup as D
    import raydedup.pipelines.dedup_scale as DS
    import raydedup.stages.candidates as C

    def _boom(*a, **k):
        raise AssertionError("finished exchange was re-run on resume")

    monkeypatch.setattr(C, "candidate_pair_refs", _boom)
    monkeypatch.setattr(C, "band_postings", _boom)
    monkeypatch.setattr(DS, "band_postings", _boom)
    monkeypatch.setattr(D, "compute_signatures", _boom)
    monkeypatch.setattr(D, "sha_emit_table", _boom)
    monkeypatch.setattr(D, "sha_key_table", _boom)

    resumed = run_dedup_checkpointed(files, d, cfg, mode="scale")
    assert resumed is not None
    assert set(resumed["metrics"]["resumed_exchanges"]) == {"exact", "candidates"}
    m2 = json.load(open(os.path.join(d, "manifest.json")))
    for stage in ("verified", "forest1", "containment"):
        assert m2["exchanges"][stage]["status"] == "done"

    got = _clusters_df(resumed)
    monkeypatch.undo()  # the direct reference run needs the real kernels
    direct = (
        run_dedup_scale(pages_to_docs(read_pages(paths["pages"])), cfg, containment=True)
        .clusters.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[direct.columns], direct)


def test_scale_resume_after_late_stage_kill(
    ray_session, small_corpus, tmp_path, cfg, monkeypatch
):
    """Kill AFTER the containment exchange commits (late phase-2): the
    resume must load exact/candidates/verified/forest1/containment from
    their bucket files — only the merge round + assignment re-run —
    and the clusters must match an uninterrupted checkpointed run."""
    from raydedup.state.checkpoint import CheckpointKilled

    spec, paths = small_corpus
    files = _pages_files(paths)
    d = str(tmp_path / "late")

    with pytest.raises(CheckpointKilled):
        run_dedup_checkpointed(
            files, d, cfg, mode="scale", fail_after_stage="containment"
        )
    ex = json.load(open(os.path.join(d, "manifest.json")))["exchanges"]
    for stage in ("exact", "candidates", "verified", "forest1", "containment"):
        assert ex[stage]["status"] == "done", stage

    # poison every finished exchange's kernel family during the resume
    import raydedup.pipelines.dedup as D
    import raydedup.pipelines.dedup_scale as DS
    import raydedup.stages.candidates as C
    import raydedup.stages.containment as CT

    def _boom(*a, **k):
        raise AssertionError("finished exchange was re-run on resume")

    monkeypatch.setattr(C, "candidate_pair_refs", _boom)
    monkeypatch.setattr(DS, "band_postings", _boom)
    monkeypatch.setattr(D, "compute_signatures", _boom)
    monkeypatch.setattr(D, "sha_key_table", _boom)
    monkeypatch.setattr(DS, "make_filter_and_shingle", _boom)
    monkeypatch.setattr(DS, "make_drop_exact_then_explode", _boom)
    monkeypatch.setattr(CT, "fingerprint_postings_table", _boom)

    resumed = run_dedup_checkpointed(files, d, cfg, mode="scale")
    assert resumed is not None
    assert set(resumed["metrics"]["resumed_exchanges"]) == {
        "exact", "candidates", "verified", "forest1", "containment"
    }
    monkeypatch.undo()

    ref = run_dedup_checkpointed(files, str(tmp_path / "ref"), cfg, mode="scale")
    pd.testing.assert_frame_equal(_clusters_df(resumed), _clusters_df(ref))


def test_completed_checkpoint_reclusters_after_new_shard(
    ray_session, small_corpus, tmp_path, cfg
):
    """Review finding on the r4 advisory fix: the exchange fingerprint
    never fires once a run COMPLETED (phase 2 skips on its done
    stages), so a shard added to a finished checkpoint kept the old
    clusters. The phase-2 shard-set gate must re-cluster with the new
    docs included — in BOTH modes."""
    import shutil

    spec, paths = small_corpus
    files = _pages_files(paths)
    for mode in ("base", "scale"):
        work = tmp_path / f"in_{mode}"
        work.mkdir()
        for f in files[:-1]:
            shutil.copy(f, work / os.path.basename(f))
        d = str(tmp_path / f"ck_{mode}")
        cur = sorted(glob.glob(str(work / "*.parquet")))
        out1 = run_dedup_checkpointed(cur, d, cfg, mode=mode)
        n1 = len(_clusters_df(out1))

        shutil.copy(files[-1], work / os.path.basename(files[-1]))
        cur = sorted(glob.glob(str(work / "*.parquet")))
        out2 = run_dedup_checkpointed(cur, d, cfg, mode=mode)
        cl2 = _clusters_df(out2)
        added = pq.read_table(files[-1]).num_rows
        assert len(cl2) == n1 + added, mode
        # the added shard's docs must actually participate: re-running
        # from scratch over the full set must agree exactly
        d3 = str(tmp_path / f"ck3_{mode}")
        out3 = run_dedup_checkpointed(cur, d3, cfg, mode=mode)
        pd.testing.assert_frame_equal(cl2, _clusters_df(out3))
