"""Store/query lifecycle: build a persistent index, match queries later.

Transplant of ``panako store`` + ``panako query`` / ``panako monitor``
(``cli/Store.java:56-90``, ``cli/Query.java:60-93``,
``OlafStrategy.java:286-353``): the "index" is a partitioned Parquet
dataset of doc tables + signature tables (no KV server —
``PanakoStorageKV.java`` becomes Parquet, per SURVEY §2 S3), and a
query run computes the query docs' signatures, finds band collisions
against the stored postings, verifies exact Jaccard, and emits ranked
QueryResult-style rows.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd
from ray.data import Dataset

from raydedup.config import DedupConfig
from raydedup.stages.signatures import shingle_hashes
from raydedup.stages.verify import jaccard_sorted
from raydedup.util import to_arrow_table


def build_index(pages_path: str, index_dir: str, cfg: DedupConfig | None = None) -> dict:
    """``panako store``: extract + fingerprint every page into a
    Parquet index (docs + signatures, sharded per input file)."""
    cfg = cfg or DedupConfig()
    files = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
    if not files:
        files = [pages_path]
    # phase 1 of the checkpointed pipeline IS the store operation
    from raydedup.pipelines.dedup import compute_signatures
    from raydedup.sources.pages import pages_to_docs
    from raydedup.state.checkpoint import (
        CheckpointManager,
        _atomic_write_table,
        _shard_key,
        shard_file_tag,
    )

    mgr = CheckpointManager(index_dir, cfg)
    stored = skipped = 0
    for f in files:
        key = _shard_key(f)
        if mgr.shard_done(key):
            skipped += 1
            continue
        tag = shard_file_tag(key)
        docs = pages_to_docs(rd.read_parquet(f)).materialize()
        sig = compute_signatures(docs, cfg, keep_shingles=False)
        docs_tbl = to_arrow_table(docs)
        sig_tbl = to_arrow_table(sig)
        _atomic_write_table(docs_tbl, mgr.path("docs", f"shard={tag}.parquet"))
        _atomic_write_table(sig_tbl, mgr.path("signatures", f"shard={tag}.parquet"))
        mgr.mark_shard(key, shard=tag, n_docs=docs_tbl.num_rows, source=f)
        stored += 1
    return {"stored_shards": stored, "skipped_shards": skipped, "index_dir": index_dir}


def _cross_side_pairs(t: pa.Table, max_postings: int) -> pa.Table:
    """Per-bucket kernel: emit (query_doc, index_doc) pairs for band runs
    containing both sides (side=1 query, side=0 index)."""
    keys = t.column("band_key").to_numpy(zero_copy_only=False)
    docs = t.column("doc_id").to_numpy(zero_copy_only=False)
    side = t.column("side").to_numpy(zero_copy_only=False)
    order = np.lexsort((docs, keys))
    keys, docs, side = keys[order], docs[order], side[order]
    n = keys.shape[0]
    empty = pa.table(
        {"q": pa.array([], pa.int64()), "m": pa.array([], pa.int64()),
         "n_partial": pa.array([], pa.int64())}
    )
    if n < 2:
        return empty
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    np.not_equal(keys[1:], keys[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    sizes = np.diff(np.append(starts, n))
    out_q, out_m = [], []
    for st, sz in zip(starts, sizes):
        if sz < 2 or sz > max_postings:
            continue
        d = docs[st : st + sz]
        s = side[st : st + sz]
        qs = np.unique(d[s == 1])
        ms = np.unique(d[s == 0])
        if qs.shape[0] == 0 or ms.shape[0] == 0:
            continue
        qq, mm = np.meshgrid(qs, ms, indexing="ij")
        out_q.append(qq.ravel())
        out_m.append(mm.ravel())
    if not out_q:
        return empty
    q = np.concatenate(out_q)
    m = np.concatenate(out_m)
    order = np.lexsort((m, q))
    q, m = q[order], m[order]
    pb = np.empty(q.shape[0], dtype=bool)
    pb[0] = True
    pb[1:] = (q[1:] != q[:-1]) | (m[1:] != m[:-1])
    st = np.flatnonzero(pb)
    counts = np.diff(np.append(st, q.shape[0]))
    return pa.table(
        {
            "q": pa.array(q[st], type=pa.int64()),
            "m": pa.array(m[st], type=pa.int64()),
            "n_partial": pa.array(counts.astype(np.int64), type=pa.int64()),
        }
    )


def query_index(
    index_dir: str,
    query_docs: Dataset,
    cfg: DedupConfig | None = None,
    top_k: int = 10,
    min_jaccard: float | None = None,
) -> pd.DataFrame:
    """``panako query``: match query docs against a stored index.

    Returns QueryResult-style rows: (query_doc_id, match_doc_id,
    match_url, n_collisions, jaccard, rank), jaccard-descending per
    query, truncated to ``top_k`` (K3: NUMBER_OF_QUERY_RESULTS analog).
    """
    from raydedup.pipelines.dedup import compute_signatures
    from raydedup.stages.candidates import band_postings
    from raydedup.stages.exchange import hash_exchange_apply
    from raydedup.stages.pair_agg import reduce_pair_table

    cfg = cfg or DedupConfig()
    tau = cfg.jaccard_tau if min_jaccard is None else min_jaccard

    idx_sigs = rd.read_parquet(os.path.join(index_dir, "signatures"))
    q_sigs = compute_signatures(query_docs, cfg, keep_shingles=False)

    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column(
                "side", pa.array(np.full(t.num_rows, side, dtype=np.int64))
            )

        return fn

    postings = band_postings(idx_sigs, cfg).map_batches(tag(0), batch_format="pyarrow").union(
        band_postings(q_sigs, cfg).map_batches(tag(1), batch_format="pyarrow")
    )
    partials = hash_exchange_apply(
        postings, "band_key", lambda t: _cross_side_pairs(t, cfg.max_band_postings)
    )
    if partials.num_rows == 0:
        return pd.DataFrame(
            {"query_doc_id": pd.Series(dtype="int64"), "match_doc_id": pd.Series(dtype="int64"),
             "match_url": pd.Series(dtype="object"), "n_collisions": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64"), "rank": pd.Series(dtype="int64")}
        )
    cand = reduce_pair_table(
        partials.rename_columns(["a", "b", "n_partial"]), sum_cols=["n_partial"]
    ).rename_columns(["a", "b", "n_collisions"])

    # verify: query texts broadcast (small side), index texts read for
    # candidate ids only
    m_ids = np.unique(cand.column("b").to_numpy(zero_copy_only=False))
    idx_docs = rd.read_parquet(os.path.join(index_dir, "docs"))
    ids_ref = ray.put(np.sort(m_ids))

    def keep(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, wanted)))

    idx_sub = (
        idx_docs.select_columns(["doc_id", "url", "text"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    q_df = query_docs.select_columns(["doc_id", "text"]).to_pandas()
    q_sets = {int(d): shingle_hashes(t, cfg) for d, t in zip(q_df["doc_id"], q_df["text"])}
    m_sets = {int(d): shingle_hashes(t, cfg) for d, t in zip(idx_sub["doc_id"], idx_sub["text"])}
    m_urls = dict(zip(idx_sub["doc_id"].astype(int), idx_sub["url"]))

    qa = cand.column("a").to_numpy(zero_copy_only=False)
    mb = cand.column("b").to_numpy(zero_copy_only=False)
    nc = cand.column("n_collisions").to_numpy(zero_copy_only=False)
    jac = np.fromiter(
        (jaccard_sorted(q_sets[int(q)], m_sets[int(m)]) for q, m in zip(qa, mb)),
        dtype=np.float64,
        count=qa.shape[0],
    )
    df = pd.DataFrame(
        {
            "query_doc_id": qa,
            "match_doc_id": mb,
            "match_url": [m_urls[int(m)] for m in mb],
            "n_collisions": nc,
            "jaccard": jac,
        }
    )
    df = df[df["jaccard"] >= tau]
    df = df.sort_values(
        ["query_doc_id", "jaccard", "match_doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    df["rank"] = df.groupby("query_doc_id").cumcount() + 1
    return df[df["rank"] <= top_k].reset_index(drop=True)


def monitor_text(
    index_dir: str,
    text: str,
    cfg: DedupConfig | None = None,
    window_tokens: int = 200,
    step_tokens: int = 160,
) -> pd.DataFrame:
    """``panako monitor``: chop a long text into overlapping token
    windows (25 s / 20 s-step analog, ``OlafStrategy.java:561-573``) and
    containment-match every window against the index via winnowed
    fingerprints; coverage >= cfg.containment_min_coverage gates a hit.
    Returns (win_start_token, win_stop_token, match_doc_id, match_url,
    coverage)."""
    from raydedup.stages.containment import winnowed_fingerprints

    cfg = cfg or DedupConfig()
    tokens = text.split()
    windows = []
    for start in range(0, max(1, len(tokens) - window_tokens + step_tokens), step_tokens):
        chunk = " ".join(tokens[start : start + window_tokens])
        if chunk:
            windows.append((start, min(start + window_tokens, len(tokens)), chunk))

    idx_docs = rd.read_parquet(os.path.join(index_dir, "docs"))
    w, s = cfg.containment_window, cfg.containment_stride

    rows = []
    idx_pd = idx_docs.select_columns(["doc_id", "url", "text"]).to_pandas()
    idx_fps = [
        (int(d), u, winnowed_fingerprints(t, w, s))
        for d, u, t in zip(idx_pd["doc_id"], idx_pd["url"], idx_pd["text"])
    ]
    for start, stop, chunk in windows:
        qf = winnowed_fingerprints(chunk, w, s)
        if qf.shape[0] == 0:
            continue
        for d, u, f in idx_fps:
            shared = np.intersect1d(qf, f, assume_unique=True).shape[0]
            cov = shared / qf.shape[0]
            if cov >= cfg.containment_min_coverage:
                rows.append((start, stop, d, u, cov))
    return pd.DataFrame(
        rows, columns=["win_start_token", "win_stop_token", "match_doc_id", "match_url", "coverage"]
    )


def delete_from_index(index_dir: str, urls: list[str]) -> dict:
    """``panako delete`` (D4 index subtraction, ``cli/Delete.java:66-130``):
    remove docs by url from a stored index. Index-as-Parquet makes delete
    a filter + rewrite of only the shards containing the victims; the
    manifest keeps its lineage (shards stay marked done — their source
    files have not changed, re-storing them would resurrect the docs,
    which matches the reference's explicit-delete semantics)."""
    from raydedup.stages.extract import doc_ids_from_urls
    from raydedup.state.checkpoint import _atomic_write_table

    victim_ids = set(int(x) for x in doc_ids_from_urls(urls))
    removed = 0
    touched = 0
    for sub in ("docs", "signatures"):
        for f in sorted(glob.glob(os.path.join(index_dir, sub, "*.parquet"))):
            t = pq.read_table(f)
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            mask = np.fromiter((int(i) not in victim_ids for i in ids), dtype=bool, count=ids.shape[0])
            if mask.all():
                continue
            if sub == "docs":
                removed += int((~mask).sum())
            _atomic_write_table(t.filter(pa.array(mask)), f)
            touched += 1
    return {"removed_docs": removed, "rewritten_shards": touched}
