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
containment links back in. Exact-dup members are pre-filtered from the
candidate pairs by a refs-only anti-join (run_dedup's driver-side
np.isin drop, expressed as two co-partitioned exchange rounds over the
pair table): a member's pairs are mirrored by its byte-identical
representative's pairs, so connectivity is preserved while member
shingle payloads never enter the verification exchanges. Outputs are
cluster-equivalent; the e2e oracle test holds the same recall/
false-merge gates for both.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset

from raydedup.config import DedupConfig
from raydedup.stages.candidates import band_postings
from raydedup.stages.cluster_scale import assignments_exchange, cluster_edge_refs
from raydedup.stages.containment import _emit_fp_pairs, fingerprint_postings_table
from raydedup.stages.exchange import hash_exchange_apply
from raydedup.stages.pair_agg import reduce_pair_table


@dataclass
class DedupScaleResult:
    clusters: Dataset
    metrics: dict[str, Any] = field(default_factory=dict)


@ray.remote
def _sorted_member_array(*edge_tables: pa.Table) -> np.ndarray:
    """sha edge tables -> sorted unique exact-dup MEMBER ids (the ``b``
    side), packed in a task for broadcast (8 B/member)."""
    arrs = [
        t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
        for t in edge_tables
        if t.num_rows
    ]
    if not arrs:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(arrs))


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


def _flatten_refs(refs: list) -> list:
    out = []
    for r in refs:
        if isinstance(r, list):
            out.extend(_flatten_refs(r))
        else:
            out.append(r)
    return out


# --- module-level stage kernels (shared by the overlapped orchestration
# below and the checkpoint-barriered resumable one) ----------------------


@ray.remote
def _member_table(t: pa.Table) -> pa.Table:
    """sha edge table -> exact-dup MEMBER ids (the ``b`` side)."""
    return pa.table({"m": t.column("b")})


@ray.remote
def _pair_id_table(t: pa.Table) -> pa.Table:
    """candidate pair bucket -> distinct demanded doc ids."""
    ids = np.unique(
        np.concatenate(
            [
                t.column("a").to_numpy(zero_copy_only=False),
                t.column("b").to_numpy(zero_copy_only=False),
            ]
        )
        if t.num_rows
        else np.empty(0, dtype=np.int64)
    )
    return pa.table({"doc_id": pa.array(ids.astype(np.int64), type=pa.int64())})


def _drop_member_ids(left: pa.Table, right: pa.Table) -> pa.Table:
    """left = demanded candidate ids bucket, right = member ids bucket
    (column ``m``): drop demanded ids that are exact-dup members."""
    if left.num_rows == 0 or right.num_rows == 0:
        return left
    mem = np.unique(right.column("m").to_numpy(zero_copy_only=False))
    v = left.column("doc_id").to_numpy(zero_copy_only=False)
    pos = np.minimum(np.searchsorted(mem, v), mem.shape[0] - 1)
    return left.filter(pa.array(mem[pos] != v))


def make_drop_exact_then_explode(window: int, stride: int):
    """Containment explode kernel: drop exact-dup members (right,
    column ``m``) from a docs bucket, then winnow-explode fingerprints."""

    def drop_exact_then_explode(left: pa.Table, right: pa.Table) -> pa.Table:
        if right.num_rows and left.num_rows:
            mem = np.unique(right.column("m").to_numpy(zero_copy_only=False))
            ids = left.column("doc_id").to_numpy(zero_copy_only=False)
            pos = np.minimum(np.searchsorted(mem, ids), mem.shape[0] - 1)
            left = left.filter(pa.array(mem[pos] != ids))
        return fingerprint_postings_table(left, window, stride)

    return drop_exact_then_explode


def make_filter_and_shingle(cfg: DedupConfig):
    """Demand-side shingle kernel: keep only demanded docs, compute
    their packed shingle sets once with the vectorized batch kernel."""
    from raydedup.stages.verify import packed_shingle_table

    def filter_and_shingle(ids_tbl: pa.Table, docs_tbl: pa.Table) -> pa.Table:
        wanted = np.unique(ids_tbl.column("doc_id").to_numpy(zero_copy_only=False))
        if docs_tbl.num_rows and wanted.shape[0]:
            ids = docs_tbl.column("doc_id").to_numpy(zero_copy_only=False)
            docs_tbl = docs_tbl.filter(pa.array(np.isin(ids, wanted)))
        else:
            docs_tbl = docs_tbl.slice(0, 0)
        return packed_shingle_table(docs_tbl, cfg)

    return filter_and_shingle


def drop_forest_member_rows(left: pa.Table, right: pa.Table) -> pa.Table:
    """Drop left rows (keyed by ``doc_id``) that are near-dup MEMBERS of
    the forest ``right`` (a=root, b=member, member rows have a != b)."""
    ra = right.column("a").to_numpy(zero_copy_only=False)
    rb = right.column("b").to_numpy(zero_copy_only=False)
    members = np.sort(rb[ra != rb])
    if members.shape[0] and left.num_rows:
        ids = left.column("doc_id").to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(members, ids), members.shape[0] - 1)
        left = left.filter(pa.array(members[pos] != ids))
    return left


def make_combine_containment(min_cov: float, min_shared: int = 1):
    """Containment pair combiner: aggregate shared-fingerprint partials
    and keep pairs with coverage >= ``min_cov`` AND shared >=
    ``min_shared`` (the short-doc chance-collision floor,
    cfg.containment_min_shared — same gate as stages/containment.py)."""

    from raydedup.stages.containment import score_containment_agg

    def combine_containment(t: pa.Table) -> pa.Table:
        return score_containment_agg(t, min_cov, min_shared).select(["a", "b"])

    return combine_containment


def _auto_buckets(n_docs: int) -> int:
    """Exchange width sized to the corpus: every bucket below ~3k docs
    is a task whose fixed latency outweighs its work, so small corpora
    run narrow (fewer task waves per exchange) and the width saturates
    at 64 where per-bucket memory bounding takes over."""
    return int(min(64, max(8, n_docs // 3000)))


def _auto_shards(n_docs: int) -> int:
    """Union-find shard-actor count: 8 actors is the steady-state pool,
    but below the scale crossover 2-4 shards cut the per-round actor
    round-trip fan-in without ever holding more than ~25k forest rows
    per shard."""
    return int(min(8, max(2, n_docs // 25_000 + 1)))


def _spill_docs_to_parquet(docs: Dataset, spill_dir: str) -> Dataset:
    """Streaming phase-1 input cache (VERDICT r4 #3): write the
    (doc_id, text, text_sha256) projection of ``docs`` to parquet under
    ``spill_dir`` ONCE — ``write_parquet`` is a streaming sink, so each
    block lands on disk as its task finishes and the corpus is never
    pinned in the object store — then return a LAZY disk-backed Dataset
    over it. Every downstream pass re-reads the pruned columns it needs
    (text ships from disk per consuming stage instead of living in the
    store for the whole run); ``count()`` is parquet-metadata-only. A
    complete cache (marker file) is reused as-is, which also makes the
    ad-hoc streaming path restartable at the phase-1 level."""
    import glob as _glob
    import shutil

    import pyarrow.parquet as _pq

    import ray.data as rd

    marker = os.path.join(spill_dir, "_SPILL_COMPLETE")
    if os.path.exists(marker):
        # reuse gate (review finding): a complete cache is only served
        # if its row count matches THIS input — otherwise a standing
        # spill dir pointed at a new corpus would silently dedup the
        # old one. The count costs one streaming pass of the input
        # lineage on the reuse path only; an equal-count content swap
        # is not caught here (use a fresh dir per corpus — the
        # checkpointed wrapper's shard-set digest covers that regime).
        cached = sum(
            _pq.ParquetFile(p).metadata.num_rows
            for p in _glob.glob(os.path.join(spill_dir, "*.parquet"))
        )
        if cached != docs.count():
            os.remove(marker)
    if not os.path.exists(marker):
        tmp = spill_dir.rstrip("/") + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        docs.select_columns(["doc_id", "text", "text_sha256"]).write_parquet(tmp)
        shutil.rmtree(spill_dir, ignore_errors=True)
        os.replace(tmp, spill_dir)
        with open(marker, "w") as f:
            f.write("ok")
    files = sorted(_glob.glob(os.path.join(spill_dir, "*.parquet")))
    return rd.read_parquet(files)


def run_dedup_scale(
    docs: Dataset,
    cfg: DedupConfig | None = None,
    *,
    containment: bool = True,
    substring: bool = False,
    num_buckets: int | None = None,
    n_shards: int | None = None,
    stream_spill_dir: str | None = None,
) -> DedupScaleResult:
    cfg = cfg or DedupConfig()
    t0 = time.perf_counter()
    metrics: dict[str, Any] = {}

    # RAYDEDUP_SCALE_PROFILE=1: ray.wait-barrier after each stage and
    # record its wall time in metrics["t_stage_*"]. Barriers REMOVE the
    # pipeline's deliberate overlap, so profiled totals exceed real runs;
    # use only to locate byte/compute hot spots.
    _profile = os.environ.get("RAYDEDUP_SCALE_PROFILE") == "1"
    _pt = [time.perf_counter()]

    def _mark(name: str, refs: list) -> None:
        if not _profile:
            return
        import ray as _ray

        flat = _flatten_refs(refs)
        if flat:
            _ray.wait(flat, num_returns=len(flat), fetch_local=False)
        now = time.perf_counter()
        metrics[f"t_stage_{name}"] = now - _pt[0]
        _pt[0] = now

    if cfg.normalize:
        from raydedup.stages.textnorm import normalized_docs

        docs = normalized_docs(docs)
    if stream_spill_dir is not None:
        # streaming phase-1: one pass to disk, lazy pruned re-reads —
        # peak object-store usage tracks the largest exchange, not the
        # corpus (the extraction/normalize lineage also runs exactly
        # once, into the cache)
        docs = _spill_docs_to_parquet(docs, stream_spill_dir)
        metrics["phase1_mode"] = "stream"
    else:
        docs = docs.materialize()
        metrics["phase1_mode"] = "materialize"

    from raydedup.stages.exchange import (
        reduce_join_resplit,
        reduce_join_split,
        split_dataset,
    )

    # --- corpus text split FIRST (async) -----------------------------------
    # The full-text split is the pipeline's largest byte mover and depends
    # only on the input; every downstream join (shingle demand, containment
    # explode) consumes it. Launching its tasks before the signature stage
    # overlaps the text movement with signature compute instead of paying
    # for it serially after the candidate barrier (the residual gap vs
    # run_dedup's id-broadcast verify, BASELINE.md).
    n_docs = docs.count()  # materialized: metadata-only
    if num_buckets is None:
        num_buckets = _auto_buckets(n_docs)
    if n_shards is None:
        n_shards = _auto_shards(n_docs)

    # union-find shard actors spawn NOW (async): their process startup
    # (~0.5 s) overlaps the signature/verify stages instead of landing
    # on the clustering critical path; both cluster rounds reuse them
    from raydedup.stages.cluster import UnionFindShard

    uf_shards = [UnionFindShard.remote(i, n_shards) for i in range(n_shards)]

    doc_text = docs.select_columns(["doc_id", "text"])
    dsplit = split_dataset(doc_text, "doc_id", num_buckets)
    _mark("text_split", dsplit)

    # --- exact sha edges (refs): same pure-NumPy kernels as run_dedup -----
    from raydedup.pipelines.dedup import sha_emit_table, sha_key_table

    keyed = docs.select_columns(["doc_id", "text_sha256"]).map_batches(
        sha_key_table, batch_format="pyarrow"
    )
    exact_refs = hash_exchange_apply(
        keyed, "sha_key", sha_emit_table, num_buckets, collect=False
    )
    _mark("exact", exact_refs)

    # --- LSH candidates (refs) -------------------------------------------
    # fused two-exchange chain (emit wave re-splits on `a` in-task);
    # per-bucket (a, b, n_collisions) tables, never collected
    from raydedup.pipelines.dedup import compute_signatures
    from raydedup.stages.candidates import candidate_pair_refs

    # opt-in (cfg.sig_skip_exact_members): signature/posting/pair work
    # scales with UNIQUE texts — each signature task waits on the sha
    # exchange via its broadcast ref (pipelined, no driver barrier) and
    # drops exact-dup members in-kernel; members reattach through the
    # sha edges so clusters are identical (measured crossover vs the
    # lost overlap in BASELINE.md).
    sig_exclude_ref = (
        _sorted_member_array.remote(*exact_refs)
        if cfg.sig_skip_exact_members
        else None
    )
    signatures = compute_signatures(
        docs, cfg, keep_shingles=False, exclude_ids_ref=sig_exclude_ref
    )
    postings = band_postings(signatures, cfg)
    cand_refs = candidate_pair_refs(postings, cfg, num_buckets)
    _mark("sig_candidates", cand_refs)
    # NOTE: counted BEFORE the exact-member drop below (run_dedup counts
    # after its driver-side drop) — the drop happens implicitly at the
    # attach joins here, so the raw LSH candidate volume is the
    # meaningful refs-only metric. Count tasks are submitted now but
    # ray.get'd only at the END: a blocking count here is a full stage
    # barrier that serializes candidates -> verify on the driver.
    cand_count_futs = [_count_rows.remote(r) for r in cand_refs]

    # --- refs-only exact-member filter (demand-side) ----------------------
    # Candidate pairs touching an exact-dup MEMBER are mirrored by the
    # member's byte-identical representative (identical signature =>
    # identical band pairs), and the sha edge reattaches the member — so
    # instead of anti-joining the (large) pair table, the members are
    # dropped from the SHINGLE DEMAND (tiny id tables, one co-partitioned
    # round): a memberless doc gets no packed-shingle row, and the attach
    # joins below drop its pairs via the lookup found-mask. Connectivity
    # is unchanged while member shingle payloads never enter the verify
    # exchanges and the pair table is never re-shuffled for filtering.
    msplit = split_dataset(
        [_member_table.remote(r) for r in exact_refs], "m", num_buckets
    )
    _mark("member_split", msplit)

    # --- verification: refs-only semi-join + packed-shingle exchange ------
    # The candidate doc-id DEMAND is itself exchanged (never broadcast —
    # at 10^12 docs even the id set outgrows one machine): per-candidate-
    # bucket id tables co-partition with the docs split, each bucket
    # kernel filters its local docs to demanded ids and computes their
    # shingle sets ONCE with the vectorized batch kernel. The full text
    # corpus is split exactly ONE time (the split refs are reused by the
    # containment explode below); only candidate shingle payloads move
    # through the two join rounds.
    from raydedup.stages.verify import (
        make_attach_a,
        make_attach_b_verify,
    )

    # --- containment explode, OVERLAPPED with verify + clustering ---------
    # The winnowing text scan only needs docs minus EXACT members (known
    # now); near-dup members found by LSH are dropped from the POSTING
    # rows after round-1 clustering (co-partitioned row filter — postings
    # inherit the doc_id bucketing from dsplit). Same result as exploding
    # after the forest (a member's removal never changes another doc's
    # fingerprints), but the expensive scan runs while the verify and
    # clustering exchanges are in flight — mirroring run_dedup's overlap,
    # refs-only.
    fp_expl_refs: list = []
    if containment:
        fp_expl_refs = reduce_join_split(
            dsplit,
            msplit,
            make_drop_exact_then_explode(cfg.containment_window, cfg.containment_stride),
            num_buckets,
        )
        _mark("fp_explode", fp_expl_refs)

    idsplit = split_dataset(
        [_pair_id_table.remote(r) for r in cand_refs], "doc_id", num_buckets
    )

    idsplit = [reduce_join_split(idsplit, msplit, _drop_member_ids, num_buckets)]
    _mark("demand_ids", idsplit)

    # per-bucket packed candidate shingles, already partitioned by
    # hash(doc_id) — usable directly as the right side of both joins
    shingled_refs = reduce_join_split(
        idsplit, dsplit, make_filter_and_shingle(cfg), num_buckets
    )
    _mark("demand_shingle", shingled_refs)
    shsplit = [shingled_refs]

    # attach round 1 re-splits its output on ``b`` in-task (fused), so
    # round 2 consumes the pieces without a separate split wave; pairs
    # whose doc has no shingle row (exact members) drop at the attach
    psplit = split_dataset(cand_refs, "a", num_buckets)
    r1 = reduce_join_resplit(
        psplit, shsplit, make_attach_a(), "b", num_buckets, num_buckets
    )
    _mark("attach_a", r1)
    verified_refs = reduce_join_split(
        r1,
        shsplit,
        make_attach_b_verify(cfg.jaccard_tau),
        num_buckets,
    )
    # deferred count (see candidate_pairs note): no driver barrier between
    # verification and clustering submission
    ver_count_futs = [_count_rows.remote(r) for r in verified_refs]
    _mark("attach_b_verify", verified_refs)

    # --- clustering round 1: exact + verified LSH edges -------------------
    # the shard actor pool (spawned at pipeline start, already warm) is
    # reused by the containment merge round below (contract() resets
    # shard state at stability, so the second round starts clean)
    edge_refs = _select_ab(verified_refs) + exact_refs
    forest_refs = cluster_edge_refs(
        edge_refs,
        n_shards=n_shards,
        num_buckets=min(num_buckets, 32),
        shards=uf_shards,
        kill=False,
    )
    _mark("cluster_r1", forest_refs)

    # --- containment over cluster REPRESENTATIVES only (refs) -------------
    # The round-1 forest (exact + near-dup members) filters the
    # fingerprint postings via an exchange join — the refs-only analog of
    # run_dedup's representative sweep: members share ~every fingerprint
    # with their representative, so sweeping them only floods the pair
    # exchange with redundant rows. The forest never touches the driver.
    extra_edge_refs: list = []
    if containment:
        # left = exploded postings bucket (fp_key, doc_id, n_fp),
        # partitioned by hash(doc_id); right = forest bucket keyed on
        # b: drop posting rows of near-dup MEMBERS — their
        # representative already carries ~every shared fingerprint,
        # so member rows only flood the pair exchange.
        # The exploded postings inherited dsplit's doc_id bucketing, so
        # the forest (keyed on b, a doc_id) co-partitions with them;
        # the member-drop join re-splits its output on fp_key IN-TASK
        # (fused) — the emit wave consumes the pieces without another
        # full pass over the posting table (the pipeline's biggest)
        fp_wave = reduce_join_resplit(
            [fp_expl_refs],
            split_dataset(forest_refs, "b", num_buckets),
            drop_forest_member_rows,
            "fp_key",
            num_buckets,
            num_buckets,
        )
        cont_cap = cfg.containment_max_postings

        # fused emit -> combine chain (emit wave re-splits on `a` in-task)
        from raydedup.stages.exchange import _reduce_bucket, reduce_apply_resplit

        cont_wave = reduce_apply_resplit(
            fp_wave,
            lambda t: _emit_fp_pairs(t, cont_cap),
            "a",
            num_buckets,
            num_buckets,
        )
        combine_containment = make_combine_containment(
            cfg.containment_min_coverage, cfg.containment_min_shared
        )
        cont_refs = [
            _reduce_bucket.remote(combine_containment, *[w[j] for w in cont_wave])
            for j in range(num_buckets)
        ]
        _mark("containment_pairs", cont_refs)
        # this count is a REQUIRED barrier: whether round-2 clustering
        # runs depends on it (and round 2 consumes the containment refs)
        metrics["containment_pairs"] = _total(cont_refs)
        metrics["t_containment_done"] = time.perf_counter() - t0
        if metrics["containment_pairs"]:
            extra_edge_refs += cont_refs

    # --- exact substring pass over representatives (refs) -----------------
    # The lossless counterpart of the winnowed containment sweep
    # (stages/substring.py): round-1 near/exact members are dropped from
    # the text split via the co-partitioned forest join (the same
    # member-drop shape as the fingerprint sweep), and the Rabin-Karp
    # window-index join runs over the surviving reps + singletons.
    # Driver cost is O(substring candidate pairs) — the verified-pair
    # order, not the corpus — the one driver-side table this mode keeps.
    if substring:
        from raydedup.stages.substring import substring_pairs

        rep_doc_refs = reduce_join_split(
            dsplit,
            split_dataset(forest_refs, "b", num_buckets),
            drop_forest_member_rows,
            num_buckets,
        )
        sub_tbl, sub_m = substring_pairs(
            rd.from_arrow_refs(rep_doc_refs), min_len=cfg.substring_min_len
        )
        metrics["substring_candidates"] = sub_m["candidates"]
        metrics["substring_pairs"] = sub_tbl.num_rows
        metrics["t_substring_done"] = time.perf_counter() - t0
        if sub_tbl.num_rows:
            extra_edge_refs.append(
                ray.put(
                    pa.table(
                        {
                            "a": sub_tbl.column("outer_id").cast(pa.int64()),
                            "b": sub_tbl.column("inner_id").cast(pa.int64()),
                        }
                    )
                )
            )

    if extra_edge_refs:
        # round 2: merge containment/substring links into the forest (the
        # forest's own edges re-attach the members transitively) — on the
        # SAME warm shard actors as round 1
        forest_refs = cluster_edge_refs(
            forest_refs + extra_edge_refs,
            n_shards=n_shards,
            num_buckets=min(num_buckets, 32),
            shards=uf_shards,
            kill=True,
        )
    else:
        for s in uf_shards:
            ray.kill(s)

    forest_count_futs = [_count_rows.remote(r) for r in forest_refs]
    clusters = assignments_exchange(docs, forest_refs, num_buckets=min(num_buckets, 32))
    # resolve the deferred metric counts (their tasks ran alongside the
    # pipeline; this get is after all real work has been submitted)
    metrics["candidate_pairs"] = int(sum(ray.get(cand_count_futs)))
    metrics["verified_pairs"] = int(sum(ray.get(ver_count_futs)))
    metrics["n_dup_docs"] = int(sum(ray.get(forest_count_futs)))
    metrics["t_total"] = time.perf_counter() - t0
    return DedupScaleResult(clusters=clusters, metrics=metrics)


def run_dedup_scale_resumable(
    docs: Dataset,
    cfg: DedupConfig | None = None,
    *,
    ckpt,
    containment: bool = True,
    substring: bool = False,
    num_buckets: int | None = None,
    n_shards: int | None = None,
    signatures: Dataset | None = None,
    stream_docs: bool = False,
) -> DedupScaleResult:
    """run_dedup_scale with per-exchange checkpoint barriers.

    ``stream_docs=True`` skips the docs materialize: the caller asserts
    ``docs`` is already cheap to re-read per stage (a disk-backed
    parquet Dataset — the checkpointed wrapper's phase-1 output), so
    each consuming stage streams its pruned columns from disk and the
    corpus is never pinned in the object store (VERDICT r4 #3).

    Same stage kernels and cluster-identical output as run_dedup_scale,
    but each exchange stage (sha edges, LSH candidate pairs, verified
    edges, round-1 forest, containment links, merged forest) commits its
    per-bucket output tables through ``ckpt``
    (state.checkpoint.ExchangeCheckpoint) before the next stage starts —
    a crash mid-phase-2 resumes from the last committed exchange instead
    of replaying all of them (VERDICT r3 #1; the reference's ``.tdb``
    resume, OlafStorageFile.java:176-191, lifted to the join stages).

    The barriers serialize the stages, giving up run_dedup_scale's
    deliberate compute/containment overlap — durability costs one
    overlap's worth of wall time, which is why the non-checkpointed
    entry point keeps its own orchestration. ``signatures`` (e.g. the
    phase-1 per-shard signature parquet) skips recomputing the
    signature kernel when the candidates stage must run.
    """
    cfg = cfg or DedupConfig()
    t0 = time.perf_counter()
    metrics: dict[str, Any] = {}

    if cfg.normalize:
        from raydedup.stages.textnorm import normalized_docs

        docs = normalized_docs(docs)
    if not stream_docs:
        docs = docs.materialize()
    n_docs = docs.count()  # materialized or parquet-backed: metadata-only
    if num_buckets is None:
        num_buckets = _auto_buckets(n_docs)
    if n_shards is None:
        n_shards = _auto_shards(n_docs)
    # stamp this run's input on every exchange stage: a checkpoint taken
    # over a different corpus size (shards added since) is invalidated
    # and re-run instead of silently dropping the new docs (advisory
    # r4). The checkpointed wrapper passes a stronger shard-set digest
    # already — keep it; the doc-count stamp is the direct-caller belt
    # (equal-count content swaps are caught by the wrapper's digest,
    # not this default).
    if ckpt.input_fp is None:
        ckpt.input_fp = f"n_docs={n_docs}"

    from raydedup.stages.exchange import (
        _reduce_bucket,
        reduce_apply_resplit,
        reduce_join_resplit,
        reduce_join_split,
        split_dataset,
    )
    from raydedup.pipelines.dedup import sha_emit_table, sha_key_table

    # lazy splits: built only if a pending stage needs them, so a resume
    # whose remaining work is (say) clustering never re-splits the corpus
    _cache: dict[str, Any] = {}

    def get_dsplit():
        if "dsplit" not in _cache:
            _cache["dsplit"] = split_dataset(
                docs.select_columns(["doc_id", "text"]), "doc_id", num_buckets
            )
        return _cache["dsplit"]

    def get_msplit():
        if "msplit" not in _cache:
            _cache["msplit"] = split_dataset(
                [_member_table.remote(r) for r in exact_refs], "m", num_buckets
            )
        return _cache["msplit"]

    # --- stage: exact sha edges ------------------------------------------
    def _exact_thunk():
        keyed = docs.select_columns(["doc_id", "text_sha256"]).map_batches(
            sha_key_table, batch_format="pyarrow"
        )
        return hash_exchange_apply(
            keyed, "sha_key", sha_emit_table, num_buckets, collect=False
        )

    exact_refs = ckpt.run("exact", _exact_thunk)

    # --- stage: LSH candidate pairs --------------------------------------
    def _cand_thunk():
        from raydedup.pipelines.dedup import compute_signatures
        from raydedup.stages.candidates import candidate_pair_refs

        sigs = signatures
        if sigs is None:
            # thread the opt-in exact-member skip exactly like the
            # non-resumable path (advisory r4: it was silently ignored
            # here); with precomputed phase-1 signatures there is
            # nothing to skip — the kernel already ran over all docs
            exclude_ref = (
                _sorted_member_array.remote(*exact_refs)
                if cfg.sig_skip_exact_members
                else None
            )
            sigs = compute_signatures(
                docs, cfg, keep_shingles=False, exclude_ids_ref=exclude_ref
            )
        postings = band_postings(sigs, cfg)
        return candidate_pair_refs(postings, cfg, num_buckets)

    cand_refs = ckpt.run("candidates", _cand_thunk)
    metrics["candidate_pairs"] = ckpt.stage_rows("candidates")

    # --- stage: verified edges -------------------------------------------
    def _verified_thunk():
        from raydedup.stages.verify import make_attach_a, make_attach_b_verify

        idsplit = split_dataset(
            [_pair_id_table.remote(r) for r in cand_refs], "doc_id", num_buckets
        )
        idsplit = [
            reduce_join_split(idsplit, get_msplit(), _drop_member_ids, num_buckets)
        ]
        shingled_refs = reduce_join_split(
            idsplit, get_dsplit(), make_filter_and_shingle(cfg), num_buckets
        )
        psplit = split_dataset(cand_refs, "a", num_buckets)
        r1 = reduce_join_resplit(
            psplit, [shingled_refs], make_attach_a(), "b", num_buckets, num_buckets
        )
        return reduce_join_split(
            r1, [shingled_refs], make_attach_b_verify(cfg.jaccard_tau), num_buckets
        )

    verified_refs = ckpt.run("verified", _verified_thunk)
    metrics["verified_pairs"] = ckpt.stage_rows("verified")

    # --- stage: round-1 forest (exact + verified LSH edges) --------------
    cl_buckets = min(num_buckets, 32)

    def _forest1_thunk():
        return cluster_edge_refs(
            _select_ab(verified_refs) + exact_refs,
            n_shards=n_shards,
            num_buckets=cl_buckets,
        )

    forest_refs = ckpt.run("forest1", _forest1_thunk)

    # --- stage: containment links over representatives -------------------
    extra_edge_refs: list = []
    if containment:
        def _cont_thunk():
            fp_expl = reduce_join_split(
                get_dsplit(),
                get_msplit(),
                make_drop_exact_then_explode(
                    cfg.containment_window, cfg.containment_stride
                ),
                num_buckets,
            )
            fp_wave = reduce_join_resplit(
                [fp_expl],
                split_dataset(forest_refs, "b", num_buckets),
                drop_forest_member_rows,
                "fp_key",
                num_buckets,
                num_buckets,
            )
            cont_cap = cfg.containment_max_postings
            cont_wave = reduce_apply_resplit(
                fp_wave,
                lambda t: _emit_fp_pairs(t, cont_cap),
                "a",
                num_buckets,
                num_buckets,
            )
            combine = make_combine_containment(
                cfg.containment_min_coverage, cfg.containment_min_shared
            )
            return [
                _reduce_bucket.remote(combine, *[w[j] for w in cont_wave])
                for j in range(num_buckets)
            ]

        cont_refs = ckpt.run("containment", _cont_thunk)
        metrics["containment_pairs"] = ckpt.stage_rows("containment")
        metrics["t_containment_done"] = time.perf_counter() - t0
        if metrics["containment_pairs"]:
            extra_edge_refs += cont_refs

    # --- stage: exact substring links over representatives ---------------
    if substring:
        def _sub_thunk():
            from raydedup.stages.substring import substring_pairs

            rep_doc_refs = reduce_join_split(
                get_dsplit(),
                split_dataset(forest_refs, "b", num_buckets),
                drop_forest_member_rows,
                num_buckets,
            )
            sub_tbl, sub_m = substring_pairs(
                rd.from_arrow_refs(rep_doc_refs), min_len=cfg.substring_min_len
            )
            return [
                ray.put(
                    pa.table(
                        {
                            "a": sub_tbl.column("outer_id").cast(pa.int64()),
                            "b": sub_tbl.column("inner_id").cast(pa.int64()),
                        }
                    )
                )
            ]

        sub_refs = ckpt.run("substring_edges", _sub_thunk)
        metrics["substring_pairs"] = ckpt.stage_rows("substring_edges")
        if metrics["substring_pairs"]:
            extra_edge_refs += sub_refs

    # --- stage: merged forest (round 2) ----------------------------------
    if extra_edge_refs:
        def _forest2_thunk():
            return cluster_edge_refs(
                forest_refs + extra_edge_refs,
                n_shards=n_shards,
                num_buckets=cl_buckets,
            )

        forest_refs = ckpt.run("forest2", _forest2_thunk)
        metrics["n_dup_docs"] = ckpt.stage_rows("forest2")
    else:
        metrics["n_dup_docs"] = ckpt.stage_rows("forest1")

    clusters = assignments_exchange(docs, forest_refs, num_buckets=cl_buckets)
    metrics["t_total"] = time.perf_counter() - t0
    metrics["resumed_exchanges"] = list(ckpt.loaded_stages)
    return DedupScaleResult(clusters=clusters, metrics=metrics)


def run_dedup_auto(
    docs: Dataset,
    cfg: DedupConfig | None = None,
    *,
    containment: bool = True,
    substring: bool = False,
    **scale_kw: Any,
):
    """Dispatch between run_dedup (driver-assisted, fastest below the
    crossover) and run_dedup_scale (refs-only, corpus-independent driver
    memory) on the input doc count vs ``cfg.scale_min_docs``.

    Both paths are cluster-equivalent (same e2e recall/false-merge
    gates). Round-4 remeasurement after the adaptive exchange width /
    early shard spawn / single-task pointer collapse: the scale path
    wins at every size tried (1k-50k all faster, 1.8x at 1M), so the
    default threshold is now 10k — only trivially small inputs stay on
    the driver-assisted path (see config.scale_min_docs). The chosen
    path is recorded in ``metrics["dedup_path"]``. Returns that path's
    native result type (both expose .clusters and .metrics)."""
    cfg = cfg or DedupConfig()
    n_docs = docs.count()  # parquet-backed inputs: metadata-only
    if n_docs >= cfg.scale_min_docs:
        if (
            cfg.stream_spill_dir is not None
            and n_docs >= cfg.scale_stream_min_docs
            and "stream_spill_dir" not in scale_kw
        ):
            # streaming phase-1 above the threshold (VERDICT r4 #3):
            # corpus cached once to disk, never pinned in the store
            scale_kw = {**scale_kw, "stream_spill_dir": cfg.stream_spill_dir}
        res = run_dedup_scale(
            docs, cfg, containment=containment, substring=substring, **scale_kw
        )
        res.metrics["dedup_path"] = "scale"
    else:
        from raydedup.pipelines.dedup import run_dedup

        res = run_dedup(docs, cfg, containment=containment, substring=substring)
        res.metrics["dedup_path"] = "base"
    res.metrics["n_docs"] = n_docs
    return res
