"""Checkpointed, resumable dedup run: per-shard signature/doc extracts +
stage-level global checkpoints with a lineage manifest.

Transplant of the reference's fingerprint file cache + bulk load
(``.tdb`` per-resource extracts re-read on re-run,
``strategy/olaf/storage/OlafStorageFile.java:176-191``; ``panako load``
rebuilding the KV store from cached extracts,
``OlafStrategy.java:623-664``; skip-if-present,
``cli/Store.java:119-127``).

Layout under ``ckpt_dir``:
  manifest.json                   lineage: config hash, shard status,
                                  per-stage status + row counts
  docs/shard=<i>.parquet          extracted docs (doc_id, url, text,
                                  text_sha256, lang) per input shard
  signatures/shard=<i>.parquet    per-shard signature table
  pairs.parquet                   verified + exact + containment edges
  components.parquet              union-find state (doc_id -> root)
  clusters/                       final assignment parquet
  exchanges/<stage>/bucket=<i>.parquet
                                  (scale mode) per-exchange bucket
                                  outputs — see ExchangeCheckpoint

Resume = anti-join of input shards against the manifest (phase 1) and
skip of completed global stages (phase 2). All writes go through a
temp-file + atomic rename; a crash mid-write leaves no partial shard
marked complete. A config change invalidates everything (the config
hash is part of the lineage).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from raydedup.config import DedupConfig


def _config_hash(cfg: DedupConfig) -> str:
    blob = json.dumps(dataclasses.asdict(cfg), sort_keys=True, default=str)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _atomic_write_table(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


class CheckpointManager:
    """Owns the manifest and the checkpoint directory layout."""

    def __init__(self, ckpt_dir: str, cfg: DedupConfig):
        self.dir = ckpt_dir
        self.cfg = cfg
        self.cfg_hash = _config_hash(cfg)
        os.makedirs(os.path.join(ckpt_dir, "docs"), exist_ok=True)
        os.makedirs(os.path.join(ckpt_dir, "signatures"), exist_ok=True)
        os.makedirs(os.path.join(ckpt_dir, "clusters"), exist_ok=True)
        self.manifest_path = os.path.join(ckpt_dir, "manifest.json")
        self.manifest = self._load()

    def _load(self) -> dict[str, Any]:
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                m = json.load(f)
            if m.get("config_hash") == self.cfg_hash:
                return m
            # config changed -> all prior state is invalid lineage
        return {"config_hash": self.cfg_hash, "shards": {}, "stages": {}}

    def save(self) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest_path)

    # --- phase 1: shards -------------------------------------------------
    def shard_done(self, shard_key: str) -> bool:
        return self.manifest["shards"].get(shard_key, {}).get("status") == "done"

    def mark_shard(self, shard_key: str, **info: Any) -> None:
        self.manifest["shards"][shard_key] = {
            "status": "done",
            "ts": time.time(),
            **info,
        }
        self.save()

    # --- phase 2: global stages -----------------------------------------
    def stage_done(self, stage: str) -> bool:
        return self.manifest["stages"].get(stage, {}).get("status") == "done"

    def mark_stage(self, stage: str, **info: Any) -> None:
        self.manifest["stages"][stage] = {"status": "done", "ts": time.time(), **info}
        self.save()

    def path(self, *parts: str) -> str:
        return os.path.join(self.dir, *parts)

    def shard_set_fingerprint(self) -> str:
        """Digest of the DONE shard-key set (basename:size tags) — the
        phase-2 input identity. Any shard added/removed/replaced since
        phase 2 last ran changes this."""
        keys = sorted(self.manifest["shards"])
        return hashlib.sha256("\n".join(keys).encode()).hexdigest()[:16]

    def invalidate_phase2(self) -> None:
        """Drop ALL phase-2 state (both modes): stage entries, exchange
        entries, and their on-disk artifacts. Phase-1 shard extracts
        stay — they are per-shard and remain valid."""
        import shutil

        for stage in ("pairs", "components", "clusters", "scale_clusters"):
            self.manifest["stages"].pop(stage, None)
        self.manifest.pop("exchanges", None)
        for f in ("pairs.parquet", "components.parquet"):
            p = self.path(f)
            if os.path.exists(p):
                os.remove(p)
        shutil.rmtree(self.path("exchanges"), ignore_errors=True)
        shutil.rmtree(self.path("clusters"), ignore_errors=True)
        os.makedirs(self.path("clusters"), exist_ok=True)
        self.save()


class CheckpointKilled(RuntimeError):
    """Raised by the test fail-injection hook to simulate a worker/driver
    loss immediately after a named exchange stage commits."""


@ray.remote
def _persist_bucket(t: pa.Table, path: str) -> int:
    _atomic_write_table(t, path)
    return t.num_rows


@ray.remote
def _read_bucket(path: str) -> pa.Table:
    return pq.read_table(path)


class ExchangeCheckpoint:
    """Per-exchange bucket persistence for the scale-path phase 2.

    The refs-only engine keeps every intermediate (sha edges, candidate
    pairs, verified edges, forest, containment links) as object-store
    refs — nothing corpus-sized ever exists on the driver, so the base
    path's pairs/components checkpoints have nothing to persist. This
    manager closes that durability gap at the EXCHANGE level instead
    (VERDICT r3 #1): each barrier stage's per-bucket output tables are
    written as spillable Parquet (atomic tmp+rename, one file per
    bucket) with per-bucket manifest rows, and a resumed run loads the
    finished stages' buckets back as refs instead of re-running their
    exchanges. Reference analog: the ``.tdb`` fingerprint cache that
    lets ``store`` resume mid-corpus (OlafStorageFile.java:176-191),
    applied to the global join stages rather than per-resource extracts.

    Layout: ``<ckpt_dir>/exchanges/<stage>/bucket=<i>.parquet``;
    manifest rows under ``manifest["exchanges"][stage]`` =
    ``{"status", "n_buckets", "buckets": {i: nrows}, "n_rows"}``.
    Bucket content is deterministic as a SET (hash-bucketing is a pure
    row function; every downstream kernel is row-order-insensitive), so
    a loaded stage is interchangeable with a recomputed one.
    """

    def __init__(self, mgr: CheckpointManager):
        self.mgr = mgr
        self.dir = mgr.path("exchanges")
        os.makedirs(self.dir, exist_ok=True)
        # test hook: raise CheckpointKilled right after this stage commits
        self.fail_after_stage: str | None = None
        # stages loaded from disk this run (observability / tests)
        self.loaded_stages: list[str] = []
        # stages whose recorded input no longer matched (re-run this run)
        self.invalidated_stages: list[str] = []
        # input fingerprint for the CURRENT run (set by the pipeline,
        # e.g. "n_docs=N"): a done stage whose recorded fingerprint
        # differs was computed from a different corpus (shards added /
        # removed since the checkpoint) and must NOT be reused — new
        # docs would otherwise silently never enter candidates/verify/
        # clustering (advisory r4). None disables the check.
        self.input_fp: str | None = None

    def _entry(self, stage: str) -> dict[str, Any]:
        return self.mgr.manifest.setdefault("exchanges", {}).setdefault(stage, {})

    def done(self, stage: str) -> bool:
        return self._entry(stage).get("status") == "done"

    def stage_rows(self, stage: str) -> int:
        return int(self._entry(stage).get("n_rows", 0))

    def _bucket_path(self, stage: str, i: int) -> str:
        return os.path.join(self.dir, stage, f"bucket={i}.parquet")

    def run(self, stage: str, thunk) -> list:
        """Return ``stage``'s per-bucket table refs: loaded from the
        checkpoint when the stage is marked done, else computed via
        ``thunk()`` (a list of ObjectRefs), persisted bucket-by-bucket
        as each write lands, and committed to the manifest."""
        entry = self._entry(stage)
        if entry.get("status") == "done":
            if self.input_fp is not None and entry.get("input_fp") != self.input_fp:
                # stale: recorded input (or a pre-fingerprint legacy
                # entry) doesn't match this run's corpus — drop the
                # stage's buckets and recompute. All stages share one
                # fingerprint, so invalidation cascades to every
                # downstream stage of the changed input automatically.
                self.invalidated_stages.append(stage)
                import shutil

                shutil.rmtree(os.path.join(self.dir, stage), ignore_errors=True)
                entry.clear()
            else:
                self.loaded_stages.append(stage)
                n = int(entry["n_buckets"])
                return [self._read(stage, i) for i in range(n)]
        refs = thunk()
        os.makedirs(os.path.join(self.dir, stage), exist_ok=True)
        pend = {
            _persist_bucket.remote(r, self._bucket_path(stage, i)): i
            for i, r in enumerate(refs)
        }
        buckets = entry.setdefault("buckets", {})
        while pend:
            ready, _ = ray.wait(list(pend), num_returns=1)
            for ref in ready:
                i = pend.pop(ref)
                buckets[str(i)] = int(ray.get(ref))
        entry.update(
            status="done",
            n_buckets=len(refs),
            n_rows=int(sum(buckets.values())),
            ts=time.time(),
            input_fp=self.input_fp,
        )
        self.mgr.save()
        if self.fail_after_stage == stage:
            raise CheckpointKilled(f"injected kill after stage {stage!r}")
        return refs

    def _read(self, stage: str, i: int):
        return _read_bucket.remote(self._bucket_path(stage, i))


def _shard_key(path: str) -> str:
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}"


def shard_file_tag(shard_key: str) -> str:
    """Stable on-disk name for a shard, derived from its key (not its
    position in the sorted input list): adding/removing/renaming other
    input files must not redirect this shard's parquet paths, or a
    resume would overwrite a done shard while it stays marked done."""
    return hashlib.sha256(shard_key.encode()).hexdigest()[:16]


def extract_shard_tables(pages_file: str, cfg: DedupConfig) -> tuple[pa.Table, pa.Table]:
    """Single-process extract + signature of ONE pages shard: plain
    pyarrow over record batches through the same batch kernels the
    Dataset stages use (``extract_batch``, ``_signature_fn``) — values
    are bit-identical to the Dataset path because both kernels are pure
    per-row functions. Used by the wave-parallel store tasks; no nested
    Ray Data inside a Ray task."""
    from raydedup.pipelines.dedup import _signature_fn
    from raydedup.stages.extract import extract_batch

    raw = pq.read_table(pages_file, columns=["url", "html", "lang"])
    docs_parts: list[pa.Table] = []
    sig_parts: list[pa.Table] = []
    for rb in raw.to_batches(max_chunksize=cfg.batch_size):
        docs = extract_batch(pa.Table.from_batches([rb]))
        docs_parts.append(docs)
        sig_parts.append(
            _signature_fn(docs.select(["doc_id", "text"]), cfg, keep_shingles=False)
        )
    if not docs_parts:  # empty shard: run kernels once for the schemas
        docs_tbl = extract_batch(raw)
        sig_tbl = _signature_fn(
            docs_tbl.select(["doc_id", "text"]), cfg, keep_shingles=False
        )
        return docs_tbl, sig_tbl
    return pa.concat_tables(docs_parts), pa.concat_tables(sig_parts)


def store_shards_parallel(
    mgr: "CheckpointManager",
    shards: list[tuple[str, str]],
    cfg: DedupConfig,
    max_in_flight: int | None = None,
) -> int:
    """Extract + fingerprint pending shards as INDEPENDENT Ray tasks —
    the analog of the reference's one-thread-pool-task-per-file store
    (``cli/Store.java:56-90``), replacing the sequential
    one-Dataset-pipeline-per-shard loop (which left the cluster idle
    whenever a shard was smaller than the task pool).

    Each task writes its two parquet files atomically; the DRIVER marks
    the manifest only on task completion, so a kill at any instant
    resumes with exactly the finished shards skipped. ``max_in_flight``
    bounds shard tables held in worker heaps simultaneously (default:
    one per CPU)."""
    if not shards:
        return 0
    import ray

    if max_in_flight is None:
        max_in_flight = max(1, int(ray.cluster_resources().get("CPU", 8)))

    @ray.remote(num_returns=1)
    def _store_shard(f: str, docs_path: str, sig_path: str, cfg: DedupConfig) -> int:
        docs_tbl, sig_tbl = extract_shard_tables(f, cfg)
        _atomic_write_table(docs_tbl, docs_path)
        _atomic_write_table(sig_tbl, sig_path)
        return docs_tbl.num_rows

    pending = list(shards)
    in_flight: dict[Any, tuple[str, str, str]] = {}
    done = 0
    while pending or in_flight:
        while pending and len(in_flight) < max_in_flight:
            f, key = pending.pop(0)
            tag = shard_file_tag(key)
            ref = _store_shard.remote(
                f,
                mgr.path("docs", f"shard={tag}.parquet"),
                mgr.path("signatures", f"shard={tag}.parquet"),
                cfg,
            )
            in_flight[ref] = (f, key, tag)
        ready, _ = ray.wait(list(in_flight), num_returns=1)
        for ref in ready:
            f, key, tag = in_flight.pop(ref)
            n_docs = ray.get(ref)
            mgr.mark_shard(key, shard=tag, n_docs=n_docs, source=f)
            done += 1
    return done


def run_dedup_checkpointed(
    pages_files: list[str],
    ckpt_dir: str,
    cfg: DedupConfig | None = None,
    *,
    containment: bool = True,
    substring: bool = False,
    max_shards: int | None = None,
    mode: str = "auto",
    fail_after_stage: str | None = None,
) -> dict[str, Any] | None:
    """Resumable dedup over a list of pages parquet shards.

    Phase 1 extracts docs + signatures per input shard (skipping shards
    the manifest marks done — the ``hasResource`` skip). Phase 2 runs
    the global LSH/verify/containment/cluster stages, checkpointing the
    edge table and the union-find component state. ``max_shards``
    processes only that many pending shards and returns None (the
    kill-point used by the resume test).

    ``mode``: "base" keeps phase 2 on the driver-assisted run_dedup
    stages (pairs/components checkpointed individually); "scale" routes
    phase 2 through the refs-only run_dedup_scale_resumable with
    PER-EXCHANGE checkpoints (each exchange stage's per-bucket outputs
    persisted as Parquet with manifest rows — a crash mid-phase-2
    resumes from the last committed exchange, never replaying finished
    ones, and phase-1 signatures feed candidate generation so the
    signature kernel never re-runs either); "auto" (default) picks by
    doc count vs ``cfg.scale_min_docs``, same crossover policy as
    run_dedup_auto. ``fail_after_stage`` is the test fail-injection
    hook: raise CheckpointKilled right after that exchange commits.

    Returns {"clusters_path", "components_path", "metrics"} when
    complete (components_path is None on the scale route).
    """
    import ray.data as rd

    from raydedup.stages.candidates import band_postings, postings_to_pairs
    from raydedup.stages.cluster import assignments_table
    from raydedup.stages.containment import containment_pairs
    from raydedup.stages.verify import verify_pairs_exchange
    from raydedup.util import to_arrow_table

    if mode not in ("auto", "base", "scale"):
        raise ValueError(f"mode must be auto|base|scale, got {mode!r}")
    cfg = cfg or DedupConfig()
    mgr = CheckpointManager(ckpt_dir, cfg)
    metrics: dict[str, Any] = {"resumed_shards": 0, "processed_shards": 0}

    # --- phase 1: per-shard extract + signatures -------------------------
    pending = []
    for f in sorted(pages_files):
        key = _shard_key(f)
        if mgr.shard_done(key):
            metrics["resumed_shards"] += 1
        else:
            pending.append((f, key))
    budget = len(pending) if max_shards is None else min(max_shards, len(pending))
    metrics["processed_shards"] += store_shards_parallel(mgr, pending[:budget], cfg)
    if budget < len(pending):
        return None  # interrupted (kill-point for tests)

    # --- phase-2 input gate (review finding on the r4 advisory fix) -----
    # The exchange-level fingerprint alone never fires once a run has
    # COMPLETED (phase 2 is skipped on its done stages before any
    # exchange is consulted), so a shard added to a finished checkpoint
    # would silently keep the old clusters. Gate ALL phase-2 state on
    # the done-shard-set digest: changed input -> drop phase-2
    # artifacts (both modes) and recompute; phase-1 extracts stay.
    fp = mgr.shard_set_fingerprint()
    if mgr.manifest.get("phase2_input_fp") != fp:
        mgr.invalidate_phase2()
        mgr.manifest["phase2_input_fp"] = fp
        mgr.save()

    # --- phase 2: global stages ------------------------------------------
    docs = rd.read_parquet(mgr.path("docs"))
    if mode == "scale" or (mode == "auto" and docs.count() >= cfg.scale_min_docs):
        exch = ExchangeCheckpoint(mgr)
        exch.input_fp = f"shards={fp}"
        exch.fail_after_stage = fail_after_stage
        return _phase2_scale(
            mgr, docs, cfg, containment, substring, metrics, exch_ckpt=exch
        )
    signatures = rd.read_parquet(mgr.path("signatures"))
    pairs_path = mgr.path("pairs.parquet")
    if not mgr.stage_done("pairs"):
        from raydedup.pipelines.dedup import exact_dedup_edges

        exact_edges = to_arrow_table(exact_dedup_edges(docs))
        candidates = postings_to_pairs(band_postings(signatures, cfg), cfg)
        cand_tbl = to_arrow_table(candidates.select_columns(["a", "b"]))
        pair_docs = np.unique(
            np.concatenate(
                [
                    cand_tbl.column("a").to_numpy(zero_copy_only=False),
                    cand_tbl.column("b").to_numpy(zero_copy_only=False),
                ]
            )
        ) if cand_tbl.num_rows else np.empty(0, dtype=np.int64)
        if cand_tbl.num_rows:
            import ray.data as _rd

            verified = verify_pairs_exchange(
                _rd.from_arrow(cand_tbl), docs, cfg, pair_docs
            )
        else:
            verified = pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "jaccard": pa.array([], pa.float64())}
            )
        edges = [verified.select(["a", "b"]), exact_edges.select(["a", "b"])]
        if containment:
            cont = to_arrow_table(
                containment_pairs(docs, cfg),
                empty_schema=pa.schema(
                    [("a", pa.int64()), ("b", pa.int64()),
                     ("shared", pa.int64()), ("coverage", pa.float64())]
                ),
            )
            edges.append(cont.select(["a", "b"]))
        if substring:
            # exact full-substring links (stages/substring.py), swept over
            # exact REPRESENTATIVES only: byte-identical texts contain each
            # other, so a k-copy sha group would emit k^2 pairs — the sha
            # edges reattach those members transitively instead
            from raydedup.stages.substring import substring_pairs

            ex_members = np.sort(
                exact_edges.column("b").to_numpy(zero_copy_only=False)
            )
            sub_docs = docs
            if ex_members.shape[0]:
                import ray as _ray

                em_ref = _ray.put(ex_members)

                def _drop_exact(t: pa.Table) -> pa.Table:
                    if t.num_rows == 0 or t.num_columns == 0:
                        return t
                    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
                    em = _ray.get(em_ref)
                    pos = np.minimum(np.searchsorted(em, ids), em.shape[0] - 1)
                    return t.filter(pa.array(em[pos] != ids))

                sub_docs = docs.map_batches(_drop_exact, batch_format="pyarrow")
            sub_tbl, _sm = substring_pairs(sub_docs, min_len=cfg.substring_min_len)
            edges.append(
                pa.table(
                    {
                        "a": sub_tbl.column("outer_id").cast(pa.int64()),
                        "b": sub_tbl.column("inner_id").cast(pa.int64()),
                    }
                )
            )
        all_edges = pa.concat_tables(edges)
        _atomic_write_table(all_edges, pairs_path)
        mgr.mark_stage(
            "pairs",
            n_edges=all_edges.num_rows,
            n_verified=verified.num_rows,
            n_exact=exact_edges.num_rows,
        )

    comp_path = mgr.path("components.parquet")
    if not mgr.stage_done("components"):
        edges = pq.read_table(pairs_path)
        from raydedup.stages.cluster import cluster_edges_arrays

        a = edges.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        b = edges.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        if a.shape[0]:
            members, roots = cluster_edges_arrays(a, b)
        else:
            members = roots = np.empty(0, dtype=np.int64)
        comp_tbl = pa.table(
            {
                "doc_id": pa.array(members, type=pa.int64()),
                "cluster_id": pa.array(roots, type=pa.int64()),
            }
        )
        _atomic_write_table(comp_tbl, comp_path)
        mgr.mark_stage("components", n_dup_docs=comp_tbl.num_rows)

    clusters_dir = mgr.path("clusters")
    if not mgr.stage_done("clusters"):
        import glob as _glob
        import shutil

        comp_tbl = pq.read_table(comp_path)
        comp = dict(
            zip(
                comp_tbl.column("doc_id").to_pylist(),
                comp_tbl.column("cluster_id").to_pylist(),
            )
        )
        clusters = assignments_table(docs, comp)
        # partitioned output (one file per block, streamed by the
        # executor — never one giant file), swapped in atomically:
        # a crash mid-write leaves the stage unmarked and the tmp dir
        # is rebuilt on resume
        tmp_dir = clusters_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        clusters.write_parquet(tmp_dir)
        shutil.rmtree(clusters_dir, ignore_errors=True)
        os.replace(tmp_dir, clusters_dir)
        n_out = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in _glob.glob(os.path.join(clusters_dir, "*.parquet"))
        )
        mgr.mark_stage("clusters", n_docs=n_out)

    metrics.update({k: v for k, v in mgr.manifest["stages"].items()})
    return {
        "clusters_path": clusters_dir,
        "components_path": comp_path,
        "metrics": metrics,
    }


def _phase2_scale(
    mgr: CheckpointManager,
    docs,
    cfg: DedupConfig,
    containment: bool,
    substring: bool,
    metrics: dict[str, Any],
    exch_ckpt: "ExchangeCheckpoint | None" = None,
) -> dict[str, Any]:
    """Scale-mode phase 2: the refs-only engine with PER-EXCHANGE
    checkpoint barriers (run_dedup_scale_resumable). The pair table /
    component map never exist as driver objects (the reason this mode
    exists), so instead of the base path's driver-side pairs/components
    checkpoints, each exchange stage's per-bucket outputs are persisted
    as Parquet through an ExchangeCheckpoint — a crash mid-phase-2
    resumes from the last committed exchange (loading its buckets back
    as refs) rather than replaying all of phase 2. Phase-1 signatures
    are fed in so a resume never re-runs the signature kernel either."""
    import glob as _glob
    import shutil

    import ray.data as rd

    clusters_dir = mgr.path("clusters")
    if not mgr.stage_done("scale_clusters"):
        from raydedup.pipelines.dedup_scale import run_dedup_scale_resumable

        res = run_dedup_scale_resumable(
            docs,
            cfg,
            ckpt=exch_ckpt or ExchangeCheckpoint(mgr),
            containment=containment,
            substring=substring,
            signatures=rd.read_parquet(mgr.path("signatures")),
            # docs IS the phase-1 parquet: stream pruned columns per
            # stage instead of pinning the corpus in the object store
            stream_docs=True,
        )
        tmp_dir = clusters_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        res.clusters.write_parquet(tmp_dir)
        shutil.rmtree(clusters_dir, ignore_errors=True)
        os.replace(tmp_dir, clusters_dir)
        n_out = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in _glob.glob(os.path.join(clusters_dir, "*.parquet"))
        )
        mgr.mark_stage(
            "scale_clusters",
            n_docs=n_out,
            **{k: v for k, v in res.metrics.items() if isinstance(v, (int, float))},
        )
        metrics["resumed_exchanges"] = res.metrics.get("resumed_exchanges", [])
    metrics.update({k: v for k, v in mgr.manifest["stages"].items()})
    metrics["dedup_path"] = "scale"
    return {
        "clusters_path": clusters_dir,
        "components_path": None,
        "metrics": metrics,
    }
