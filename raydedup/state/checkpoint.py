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


def _shard_key(path: str) -> str:
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}"


def shard_file_tag(shard_key: str) -> str:
    """Stable on-disk name for a shard, derived from its key (not its
    position in the sorted input list): adding/removing/renaming other
    input files must not redirect this shard's parquet paths, or a
    resume would overwrite a done shard while it stays marked done."""
    return hashlib.sha256(shard_key.encode()).hexdigest()[:16]


def run_dedup_checkpointed(
    pages_files: list[str],
    ckpt_dir: str,
    cfg: DedupConfig | None = None,
    *,
    containment: bool = True,
    max_shards: int | None = None,
) -> dict[str, Any] | None:
    """Resumable dedup over a list of pages parquet shards.

    Phase 1 extracts docs + signatures per input shard (skipping shards
    the manifest marks done — the ``hasResource`` skip). Phase 2 runs
    the global LSH/verify/containment/cluster stages, checkpointing the
    edge table and the union-find component state. ``max_shards``
    processes only that many pending shards and returns None (the
    kill-point used by the resume test).

    Returns {"clusters_path", "components_path", "metrics"} when
    complete.
    """
    import ray.data as rd

    from raydedup.pipelines.dedup import compute_signatures
    from raydedup.sources.pages import pages_to_docs
    from raydedup.stages.candidates import band_postings, postings_to_pairs
    from raydedup.stages.cluster import UnionFind, assignments_table
    from raydedup.stages.containment import containment_pairs
    from raydedup.stages.verify import verify_pairs_exchange
    from raydedup.util import to_arrow_table

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
    for f, key in pending[:budget]:
        tag = shard_file_tag(key)
        docs = pages_to_docs(rd.read_parquet(f)).materialize()
        sig = compute_signatures(docs, cfg, keep_shingles=False)
        docs_tbl = to_arrow_table(docs)
        sig_tbl = to_arrow_table(sig)
        _atomic_write_table(docs_tbl, mgr.path("docs", f"shard={tag}.parquet"))
        _atomic_write_table(sig_tbl, mgr.path("signatures", f"shard={tag}.parquet"))
        mgr.mark_shard(key, shard=tag, n_docs=docs_tbl.num_rows, source=f)
        metrics["processed_shards"] += 1
    if budget < len(pending):
        return None  # interrupted (kill-point for tests)

    # --- phase 2: global stages ------------------------------------------
    docs = rd.read_parquet(mgr.path("docs"))
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
        uf = UnionFind()
        a = edges.column("a").to_numpy(zero_copy_only=False)
        b = edges.column("b").to_numpy(zero_copy_only=False)
        for i in range(a.shape[0]):
            uf.union(int(a[i]), int(b[i]))
        comp = uf.components()
        comp_tbl = pa.table(
            {
                "doc_id": pa.array(list(comp.keys()), type=pa.int64()),
                "cluster_id": pa.array(list(comp.values()), type=pa.int64()),
            }
        )
        _atomic_write_table(comp_tbl, comp_path)
        mgr.mark_stage("components", n_dup_docs=comp_tbl.num_rows)

    clusters_dir = mgr.path("clusters")
    if not mgr.stage_done("clusters"):
        comp_tbl = pq.read_table(comp_path)
        comp = dict(
            zip(
                comp_tbl.column("doc_id").to_pylist(),
                comp_tbl.column("cluster_id").to_pylist(),
            )
        )
        clusters = assignments_table(docs, comp)
        out = to_arrow_table(clusters)
        _atomic_write_table(out, os.path.join(clusters_dir, "part-00000.parquet"))
        mgr.mark_stage("clusters", n_docs=out.num_rows)

    metrics.update({k: v for k, v in mgr.manifest["stages"].items()})
    return {
        "clusters_path": clusters_dir,
        "components_path": comp_path,
        "metrics": metrics,
    }
