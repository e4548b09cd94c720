"""Driver-light dedup pipeline: nothing corpus-proportional on the driver.

``run_dedup`` (pipelines/dedup.py) materializes candidate pairs, verified
edges and the component map on the driver — fine up to hundreds of
millions of docs, impossible at 10^12 (the PAIR LIST outgrows one
machine). This variant keeps every intermediate as object-store refs:

  postings -> exchange (refs) -> pair combine exchange (refs)
  verification: two co-partitioned exchange joins against the docs table
  clustering: edges routed to union-find shard actors FROM TASKS,
  iterated contraction + pointer-jump exchanges (stages/cluster_scale)
  assignment: docs x forest exchange join -> Dataset of refs

The driver sees per-bucket row counts and convergence signatures —
bytes, independent of corpus size. Containment sweeps cluster
REPRESENTATIVES only, like run_dedup, but refs-only: the round-1
component forest filters the fingerprint postings via an exchange join
(never a collected member set), and a second clustering round merges the
containment links back in. Remaining trade-off vs run_dedup: exact-dup
members are not pre-filtered from LSH candidates (their pairs verify
trivially and contract away). Outputs are cluster-equivalent; the e2e
oracle test holds the same recall/false-merge gates for both.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from raydedup.config import DedupConfig
from raydedup.stages.candidates import band_postings, emit_pairs_partition
from raydedup.stages.cluster_scale import assignments_exchange, cluster_edge_refs
from raydedup.stages.containment import _emit_fp_pairs, fingerprint_postings
from raydedup.stages.exchange import hash_exchange_apply, hash_exchange_join
from raydedup.stages.pair_agg import reduce_pair_table
from raydedup.stages.signatures import shingle_hashes
from raydedup.stages.verify import jaccard_sorted


@dataclass
class DedupScaleResult:
    clusters: Dataset
    metrics: dict[str, Any] = field(default_factory=dict)


@ray.remote
def _count_rows(t: pa.Table) -> int:
    return t.num_rows


def _total(refs: list) -> int:
    return int(sum(ray.get([_count_rows.remote(r) for r in refs])))


def _select_ab(refs: list) -> list:
    @ray.remote
    def sel(t: pa.Table) -> pa.Table:
        return t.select(["a", "b"])

    return [sel.remote(r) for r in refs]


def run_dedup_scale(
    docs: Dataset,
    cfg: DedupConfig | None = None,
    *,
    containment: bool = True,
    num_buckets: int = 64,
    n_shards: int = 8,
) -> DedupScaleResult:
    cfg = cfg or DedupConfig()
    t0 = time.perf_counter()
    metrics: dict[str, Any] = {}
    docs = docs.materialize()

    # --- exact sha edges (refs) ------------------------------------------
    def add_key(t: pa.Table) -> pa.Table:
        digests = t.column("text_sha256").to_pylist()
        key = (
            np.frombuffer(b"".join(digests), dtype=">i8").reshape(-1, 4)[:, 0]
            if digests
            else np.empty(0, dtype=np.int64)
        ).astype(np.int64)
        return pa.table(
            {
                "sha_key": pa.array(key, type=pa.int64()),
                "doc_id": t.column("doc_id"),
                "text_sha256": t.column("text_sha256"),
            }
        )

    def sha_emit(t: pa.Table) -> pa.Table:
        
        part = t.to_pandas().sort_values(["sha_key", "doc_id"], kind="mergesort")
        cand = part[part["sha_key"].duplicated(keep=False)]
        if cand.empty:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        rep = cand.groupby("text_sha256", sort=False)["doc_id"].transform("min")
        mask = cand["doc_id"].to_numpy() != rep.to_numpy()
        return pa.table(
            {
                "a": pa.array(rep.to_numpy()[mask].astype(np.int64), type=pa.int64()),
                "b": pa.array(cand["doc_id"].to_numpy()[mask].astype(np.int64), type=pa.int64()),
            }
        )

    keyed = docs.select_columns(["doc_id", "text_sha256"]).map_batches(
        add_key, batch_format="pyarrow"
    )
    exact_refs = hash_exchange_apply(keyed, "sha_key", sha_emit, num_buckets, collect=False)

    # --- LSH candidates (refs) -------------------------------------------
    from raydedup.pipelines.dedup import compute_signatures

    signatures = compute_signatures(docs, cfg, keep_shingles=False)
    postings = band_postings(signatures, cfg)
    partial_refs = hash_exchange_apply(
        postings,
        "band_key",
        lambda t: emit_pairs_partition(t, cfg.max_band_postings),
        num_buckets,
        collect=False,
    )
    thr = cfg.min_band_collisions

    def combine_candidates(t: pa.Table) -> pa.Table:
        out = reduce_pair_table(t, sum_cols=["n_partial"]).rename_columns(
            ["a", "b", "n_collisions"]
        )
        if thr > 1:
            out = out.filter(pa.compute.greater_equal(out["n_collisions"], thr))
        return out

    cand_refs = hash_exchange_apply(
        partial_refs, "a", combine_candidates, num_buckets, collect=False
    )
    metrics["candidate_pairs"] = _total(cand_refs)

    # --- verification: exchange joins against the full docs table ---------
    doc_text = docs.select_columns(["doc_id", "text"]).materialize()
    tau = cfg.jaccard_tau

    def attach_a(left: pa.Table, right: pa.Table) -> pa.Table:
        texts = dict(zip(right.column("doc_id").to_pylist(), right.column("text").to_pylist()))
        sets = {}
        sa = []
        for x in left.column("a").to_pylist():
            s = sets.get(x)
            if s is None:
                s = sets[x] = shingle_hashes(texts[x], cfg)
            sa.append(s.tobytes())
        return pa.table(
            {
                "a": left.column("a"),
                "b": left.column("b"),
                "shingles_a": pa.array(sa, type=pa.large_binary()),
            }
        )

    def attach_b_verify(left: pa.Table, right: pa.Table) -> pa.Table:
        texts = dict(zip(right.column("doc_id").to_pylist(), right.column("text").to_pylist()))
        sets: dict[int, np.ndarray] = {}
        b = left.column("b").to_pylist()
        sa = left.column("shingles_a").to_pylist()
        jac = np.empty(len(b), dtype=np.float64)
        for i in range(len(b)):
            s = sets.get(b[i])
            if s is None:
                s = sets[b[i]] = shingle_hashes(texts[b[i]], cfg)
            jac[i] = jaccard_sorted(np.frombuffer(sa[i], dtype=np.uint64), s)
        return pa.table(
            {
                "a": left.column("a"),
                "b": left.column("b"),
                "jaccard": pa.array(jac, type=pa.float64()),
            }
        ).filter(pa.array(jac >= tau))

    r1 = hash_exchange_join(cand_refs, doc_text, "a", "doc_id", attach_a, num_buckets)
    verified_refs = hash_exchange_join(r1, doc_text, "b", "doc_id", attach_b_verify, num_buckets)
    metrics["verified_pairs"] = _total(verified_refs)

    # --- clustering round 1: exact + verified LSH edges -------------------
    edge_refs = _select_ab(verified_refs) + exact_refs
    forest_refs = cluster_edge_refs(
        edge_refs, n_shards=n_shards, num_buckets=min(num_buckets, 32)
    )

    # --- containment over cluster REPRESENTATIVES only (refs) -------------
    # The round-1 forest (exact + near-dup members) filters the
    # fingerprint postings via an exchange join — the refs-only analog of
    # run_dedup's representative sweep: members share ~every fingerprint
    # with their representative, so sweeping them only floods the pair
    # exchange with redundant rows. The forest never touches the driver.
    if containment:
        def drop_members(left: pa.Table, right: pa.Table) -> pa.Table:
            ra = right.column("a").to_numpy(zero_copy_only=False)
            rb = right.column("b").to_numpy(zero_copy_only=False)
            members = np.sort(rb[ra != rb])
            if members.shape[0] == 0 or left.num_rows == 0:
                return left
            ids = left.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(members, ids), members.shape[0] - 1)
            return left.filter(pa.array(members[pos] != ids))

        fp_filtered_refs = hash_exchange_join(
            fingerprint_postings(docs, cfg),
            forest_refs,
            "doc_id",
            "b",
            drop_members,
            num_buckets,
        )
        fp_partial_refs = hash_exchange_apply(
            fp_filtered_refs,
            "fp_key",
            lambda t: _emit_fp_pairs(t, cfg.containment_max_postings),
            num_buckets,
            collect=False,
        )
        min_cov = cfg.containment_min_coverage

        def combine_containment(t: pa.Table) -> pa.Table:
            agg = reduce_pair_table(
                t, sum_cols=["shared_partial"], min_cols=["n_fp_a", "n_fp_b"]
            ).rename_columns(["a", "b", "shared", "n_fp_a", "n_fp_b"])
            shared = agg.column("shared").to_numpy(zero_copy_only=False).astype(np.float64)
            na = agg.column("n_fp_a").to_numpy(zero_copy_only=False).astype(np.float64)
            nb = agg.column("n_fp_b").to_numpy(zero_copy_only=False).astype(np.float64)
            cov = shared / np.maximum(np.minimum(na, nb), 1.0)
            return agg.select(["a", "b"]).filter(pa.array(cov >= min_cov))

        cont_refs = hash_exchange_apply(
            fp_partial_refs, "a", combine_containment, num_buckets, collect=False
        )
        metrics["containment_pairs"] = _total(cont_refs)
        if metrics["containment_pairs"]:
            # round 2: merge containment links into the forest (the
            # forest's own edges re-attach the members transitively)
            forest_refs = cluster_edge_refs(
                forest_refs + cont_refs,
                n_shards=n_shards,
                num_buckets=min(num_buckets, 32),
            )

    metrics["n_dup_docs"] = _total(forest_refs)
    clusters = assignments_exchange(docs, forest_refs, num_buckets=min(num_buckets, 32))
    metrics["t_total"] = time.perf_counter() - t0
    return DedupScaleResult(clusters=clusters, metrics=metrics)
