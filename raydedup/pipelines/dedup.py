"""End-to-end near-duplicate detection + clustering pipeline.

The graft's primary lifecycle — transplant of ``panako deduplication``
(``cli/Deduplication.java:90-108``: store the whole corpus, then monitor
every file against the index with ``avoid={self}``). Here it is one
streaming Ray Data job:

  docs -> exact dedup (sha256 groupby, ``Deduplication.java:66-88``)
       -> SignatureKernel map_batches (MinHash+SimHash; the fingerprint
          kernel, ``OlafEventPointProcessor.java`` et al.)
       -> band postings -> groupby(band_key) pair emission (the inverted
          near-hash lookup, ``PanakoStorageKV.java:293-379``)
       -> exact-Jaccard verification (``OlafStrategy.java:331-453``)
       -> union-find clustering (graft extension)
       -> (optional) containment pass over representatives
          (``OlafStrategy.java:561-573`` monitor-window analog)

Exact duplicates are collapsed *before* signatures: one representative
per sha256 group flows through LSH (at CC scale a large fraction of
pages are byte-identical — this collapses the hottest skew source), and
final clusters are re-expanded over exact members at assignment time.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from raydedup.config import DedupConfig
from raydedup.stages.candidates import (
    band_postings,
    band_size_stats,
    postings_to_pairs,
    simhash_postings,
)
from raydedup.stages.containment import containment_pairs
from raydedup.stages.cluster import (
    assignments_table,
    cluster_pairs_actors,
    cluster_pairs_driver,
)
from raydedup.stages.signatures import SignatureKernel
from raydedup.stages.verify import verify_pairs
from raydedup.util import to_arrow_table


@dataclass
class DedupResult:
    clusters: Dataset  # (doc_id, cluster_id, is_representative)
    verified_pairs: pa.Table  # (a, b, jaccard)
    exact_edges: pa.Table  # (a=rep, b=member)
    components: dict[int, int]
    metrics: dict[str, Any] = field(default_factory=dict)


def exact_dedup_edges(docs: Dataset, num_buckets: int = 64) -> Dataset:
    """sha256 groupby -> (a=group min doc_id, b=member) edges for groups >= 2.

    Shuffles on a coarse hash bucket of the 64-bit sha prefix (one group
    per bucket, vectorized inside); full-digest equality is resolved
    inside the bucket kernel, so sha-prefix collisions are safe. The
    sha-prefix collision *within different buckets* cannot happen (the
    bucket is a pure function of the digest).
    """

    def add_key(t: pa.Table) -> pa.Table:
        digests = t.column("text_sha256").to_pylist()
        key = (
            np.frombuffer(b"".join(digests), dtype=">i8").reshape(-1, 4)[:, 0]
            if digests
            else np.empty(0, dtype=np.int64)
        ).astype(np.int64)
        bucket = (key % num_buckets + num_buckets) % num_buckets
        return pa.table(
            {
                "bucket": pa.array(bucket, type=pa.int64()),
                "sha_key": pa.array(key, type=pa.int64()),
                "doc_id": t.column("doc_id"),
                "text_sha256": t.column("text_sha256"),
            }
        )

    keyed = docs.select_columns(["doc_id", "text_sha256"]).map_batches(
        add_key, batch_format="pyarrow"
    )

    def emit(part: pd.DataFrame) -> pd.DataFrame:
        # vectorized duplicate-group detection within one bucket
        part = part.sort_values(["sha_key", "doc_id"], kind="mergesort")
        dup_keys = part["sha_key"].duplicated(keep=False)
        cand = part[dup_keys]
        if cand.empty:
            return pd.DataFrame({"a": np.empty(0, np.int64), "b": np.empty(0, np.int64)})
        grp = cand.groupby("text_sha256", sort=False)["doc_id"]
        rep = grp.transform("min")
        mask = cand["doc_id"].to_numpy() != rep.to_numpy()
        return pd.DataFrame(
            {
                "a": rep.to_numpy()[mask].astype(np.int64),
                "b": cand["doc_id"].to_numpy()[mask].astype(np.int64),
            }
        )

    return keyed.groupby("bucket").map_groups(emit, batch_format="pandas")


_KERNELS: dict[Any, SignatureKernel] = {}


def _signature_fn(batch: pa.Table, cfg: DedupConfig, keep_shingles: bool) -> pa.Table:
    # per-worker-process kernel cache: permutation tables + word-hash cache
    # built once per process, reused across task invocations (stateless-task
    # variant of the actor-pool pattern)
    key = (cfg, keep_shingles)
    kernel = _KERNELS.get(key)
    if kernel is None:
        kernel = _KERNELS[key] = SignatureKernel(cfg, keep_shingles=keep_shingles)
    return kernel(batch)


def compute_signatures(docs: Dataset, cfg: DedupConfig, keep_shingles: bool = True) -> Dataset:
    src = docs.select_columns(["doc_id", "text"])
    if cfg.signature_concurrency:
        # explicit actor pool (ST1 analog: state loaded once per actor)
        return src.map_batches(
            SignatureKernel,
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            fn_constructor_kwargs={"cfg": cfg, "keep_shingles": keep_shingles},
            concurrency=cfg.signature_concurrency,
        )
    return src.map_batches(
        _signature_fn,
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        fn_kwargs={"cfg": cfg, "keep_shingles": keep_shingles},
    )


def run_dedup(
    docs: Dataset,
    cfg: DedupConfig | None = None,
    *,
    use_simhash: bool = False,
    containment: bool = False,
    collect_metrics: bool = False,
    num_partitions: int | None = None,
) -> DedupResult:
    """Full pipeline over a docs Dataset (doc_id:int64-castable, text,
    text_sha256). Returns clusters + verified pairs + metrics."""
    cfg = cfg or DedupConfig()
    t0 = time.perf_counter()
    metrics: dict[str, Any] = {}

    # --- exact dedup pre-pass (D1) ---------------------------------------
    exact_edges = to_arrow_table(exact_dedup_edges(docs))
    exact_members = set(exact_edges.column("b").to_pylist())
    metrics["exact_edges"] = exact_edges.num_rows
    t1 = time.perf_counter()
    metrics["t_exact"] = t1 - t0

    # --- signatures over unique-text docs (M1-M5) ------------------------
    if exact_members:
        import ray

        members_ref = ray.put(np.array(sorted(exact_members), dtype=np.int64))

        def drop_members(t: pa.Table) -> pa.Table:
            members = ray.get(members_ref)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
            keep = ~np.isin(ids, members)
            return t.filter(pa.array(keep))

        uniq_docs = docs.map_batches(drop_members, batch_format="pyarrow")
    else:
        uniq_docs = docs
    # Materialized once: consumed by postings, band stats AND both sides of
    # the verification join. In the checkpointed scale path this is the
    # per-partition signatures Parquet write (analog of the .tdb
    # fingerprint cache, OlafStorageFile.java:176-191); here it pins the
    # compact signature table in the object store (spillable).
    signatures = compute_signatures(uniq_docs, cfg).materialize()

    # --- candidates (J1): minhash bands (+ simhash blocks) ----------------
    postings = band_postings(signatures, cfg)
    if use_simhash:
        postings = postings.union(simhash_postings(signatures, cfg))
    if collect_metrics:
        metrics["band_stats"] = band_size_stats(band_postings(signatures, cfg), cfg)
    # candidate pairs are post-LSH small; materializing avoids re-running
    # the groupby lineage inside the verification join's shuffle
    candidates = postings_to_pairs(postings, cfg).materialize()
    n_candidates = candidates.count()
    metrics["candidate_pairs"] = n_candidates
    # --- verification (A1-A4 analog) --------------------------------------
    if n_candidates == 0:
        verified_tbl = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    else:
        verified = verify_pairs(candidates, signatures, cfg, num_partitions=num_partitions)
        verified_tbl = to_arrow_table(verified)
    t2 = time.perf_counter()
    metrics["t_candidates_verify"] = t2 - t1
    metrics["verified_pairs"] = verified_tbl.num_rows

    # --- containment pass (W1 monitor-window analog) ----------------------
    containment_tbl = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    if containment:
        cont = containment_pairs(uniq_docs if exact_members else docs, cfg)
        cont_schema = pa.schema(
            [("a", pa.int64()), ("b", pa.int64()),
             ("shared", pa.int64()), ("coverage", pa.float64())]
        )
        containment_tbl = to_arrow_table(cont, empty_schema=cont_schema).select(["a", "b"])
        metrics["containment_pairs"] = containment_tbl.num_rows

    # --- clustering (union-find) ------------------------------------------
    all_edges = pa.concat_tables(
        [verified_tbl.select(["a", "b"]), exact_edges.select(["a", "b"]), containment_tbl]
    )
    edges_df = all_edges.to_pandas()
    if cfg.cluster_backend == "actors":
        components = cluster_pairs_actors(edges_df, n_shards=cfg.n_cluster_shards)
    else:
        components = cluster_pairs_driver(edges_df)
    metrics["n_dup_docs"] = len(components)
    metrics["n_clusters"] = len(set(components.values()))
    clusters = assignments_table(docs, components)
    t3 = time.perf_counter()
    metrics["t_cluster"] = t3 - t2
    metrics["t_total"] = t3 - t0

    return DedupResult(
        clusters=clusters,
        verified_pairs=verified_tbl,
        exact_edges=exact_edges,
        components=components,
        metrics=metrics,
    )
