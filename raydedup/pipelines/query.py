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
from raydedup.util import to_arrow_table


def build_index(pages_path: str, index_dir: str, cfg: DedupConfig | None = None) -> dict:
    """``panako store``: extract + fingerprint every page into a
    Parquet index (docs + signatures, sharded per input file)."""
    cfg = cfg or DedupConfig()
    files = sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
    if not files:
        files = [pages_path]
    # phase 1 of the checkpointed pipeline IS the store operation:
    # wave-parallel independent shard tasks (cli/Store.java:56-90 analog)
    from raydedup.state.checkpoint import (
        CheckpointManager,
        _shard_key,
        store_shards_parallel,
    )

    mgr = CheckpointManager(index_dir, cfg)
    pending = [(f, _shard_key(f)) for f in files]
    pending = [(f, k) for f, k in pending if not mgr.shard_done(k)]
    skipped = len(files) - len(pending)
    stored = store_shards_parallel(mgr, pending, cfg)
    return {"stored_shards": stored, "skipped_shards": skipped, "index_dir": index_dir}


def _cross_side_pairs(t: pa.Table, max_postings: int) -> pa.Table:
    """Per-bucket kernel: emit (query_doc, index_doc) pairs for band runs
    containing both sides (side=1 query, side=0 index).

    Fully vectorized (run arithmetic, no per-run Python — the pattern
    that measured 4.6× faster under a full task pool in the containment
    kernel): one lexsort by (key, side, doc), raw-size cap per run,
    in-run (side, doc) dedup by boundary mask, then the q×m cross
    products of ALL runs emitted with one flat index computation."""
    keys = t.column("band_key").to_numpy(zero_copy_only=False)
    docs = t.column("doc_id").to_numpy(zero_copy_only=False)
    side = t.column("side").to_numpy(zero_copy_only=False)
    n = keys.shape[0]
    empty = pa.table(
        {"q": pa.array([], pa.int64()), "m": pa.array([], pa.int64()),
         "n_partial": pa.array([], pa.int64())}
    )
    if n < 2:
        return empty
    order = np.lexsort((docs, side, keys))
    keys, docs, side = keys[order], docs[order], side[order]
    # raw band runs (cap applies to RAW posting-run size, pre-dedup)
    boundary = np.empty(n, dtype=bool)
    boundary[0] = True
    np.not_equal(keys[1:], keys[:-1], out=boundary[1:])
    starts = np.flatnonzero(boundary)
    sizes = np.diff(np.append(starts, n))
    keep_run = (sizes >= 2) & (sizes <= max_postings)
    if not keep_run.any():
        return empty
    rowkeep = np.repeat(keep_run, sizes)
    keys, docs, side = keys[rowkeep], docs[rowkeep], side[rowkeep]
    # dedup (key, side, doc) triples (rows are sorted by all three)
    uniq = np.empty(keys.shape[0], dtype=bool)
    uniq[0] = True
    uniq[1:] = (
        (keys[1:] != keys[:-1]) | (side[1:] != side[:-1]) | (docs[1:] != docs[:-1])
    )
    keys, docs, side = keys[uniq], docs[uniq], side[uniq]
    # per-run side counts: side 0 (index) sorts first within each run
    nb = np.empty(keys.shape[0], dtype=bool)
    nb[0] = True
    np.not_equal(keys[1:], keys[:-1], out=nb[1:])
    starts2 = np.flatnonzero(nb)
    sizes2 = np.diff(np.append(starts2, keys.shape[0]))
    q_cnt = np.add.reduceat(side, starts2)
    m_cnt = sizes2 - q_cnt
    both = (q_cnt > 0) & (m_cnt > 0)
    if not both.any():
        return empty
    starts2, q_cnt, m_cnt = starts2[both], q_cnt[both], m_cnt[both]
    # flat cross-product emission: output j of run i is
    # (qdocs[j // m_i], mdocs[j % m_i])
    counts = q_cnt * m_cnt
    tot = int(counts.sum())
    off = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(tot, dtype=np.int64) - np.repeat(off, counts)
    m_rep = np.repeat(m_cnt, counts)
    q = docs[np.repeat(starts2 + m_cnt, counts) + local // m_rep]
    m = docs[np.repeat(starts2, counts) + local % m_rep]
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
    with_segments: bool = False,
) -> pd.DataFrame:
    """``panako query``: match query docs against a stored index.

    Returns QueryResult-style rows: (query_doc_id, match_doc_id,
    match_url, n_collisions, jaccard, rank), jaccard-descending per
    query, truncated to ``top_k`` (K3: NUMBER_OF_QUERY_RESULTS analog).
    ``with_segments`` appends the matched-segment columns (lcs_tokens,
    lcs_ratio, query_start_token, match_start_token) — the reference's
    matched start/stop fields (``strategy/QueryResult.java:31-73``).
    """
    from raydedup.pipelines.dedup import compute_signatures
    from raydedup.stages.candidates import band_postings
    from raydedup.stages.exchange import hash_exchange_apply
    from raydedup.stages.pair_agg import reduce_pair_table

    cfg = cfg or DedupConfig()
    tau = cfg.jaccard_tau if min_jaccard is None else min_jaccard

    # prune at the read: band_postings consumes only (doc_id, bands) —
    # the simhash column never leaves storage (the 100-TB habit)
    idx_sigs = rd.read_parquet(
        os.path.join(index_dir, "signatures"), columns=["doc_id", "bands"]
    )
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

    # verify through the broadcast verify stage (no driver-side shingle
    # loops): the pair table joins a UNION of query docs and the
    # candidate index docs; texts are shingled in a parallel map and
    # broadcast once as packed arrays
    from raydedup.stages.verify import verify_pairs_small

    m_ids = np.unique(cand.column("b").to_numpy(zero_copy_only=False))
    q_ids = np.unique(cand.column("a").to_numpy(zero_copy_only=False))
    pair_docs = np.union1d(m_ids, q_ids)
    # only (doc_id, text, url) are consumed below (verify + url attach)
    idx_docs = rd.read_parquet(
        os.path.join(index_dir, "docs"), columns=["doc_id", "text", "url"]
    )
    ids_ref = ray.put(np.sort(m_ids))

    def keep(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, wanted)))

    idx_sub = idx_docs.select_columns(["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow"
    )
    union_docs = query_docs.select_columns(["doc_id", "text"]).union(idx_sub)
    vcfg = cfg.with_overrides(jaccard_tau=tau)
    verified = to_arrow_table(
        verify_pairs_small(rd.from_arrow(cand), union_docs, vcfg, pair_docs),
        empty_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("jaccard", pa.float64())]
        ),
    ).to_pandas()

    df = cand.to_pandas().merge(verified, on=["a", "b"], how="inner")
    df = df.rename(columns={"a": "query_doc_id", "b": "match_doc_id"})

    # urls for surviving matches only
    mm = np.sort(df["match_doc_id"].unique().astype(np.int64))
    murl_ref = ray.put(mm)

    def keep_urls(t: pa.Table) -> pa.Table:
        wanted = ray.get(murl_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, wanted)))

    url_df = (
        idx_docs.select_columns(["doc_id", "url"])
        .map_batches(keep_urls, batch_format="pyarrow")
        .to_pandas()
    ) if len(df) else pd.DataFrame({"doc_id": [], "url": []})
    urls = {int(d): u for d, u in zip(url_df["doc_id"], url_df["url"])}
    df["match_url"] = df["match_doc_id"].map(lambda d: urls.get(int(d)))
    df = df.sort_values(
        ["query_doc_id", "jaccard", "match_doc_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    df["rank"] = df.groupby("query_doc_id").cumcount() + 1
    df = df[df["rank"] <= top_k].reset_index(drop=True)
    cols = ["query_doc_id", "match_doc_id", "match_url", "n_collisions", "jaccard", "rank"]
    seg_cols = ["lcs_tokens", "lcs_ratio", "query_start_token", "match_start_token"]
    if with_segments and not len(df):
        # stable output schema even with zero hits
        for c in seg_cols:
            df[c] = pd.Series(
                dtype="float64" if c == "lcs_ratio" else "int64"
            )
        cols += seg_cols
    if with_segments and len(df):
        # matched start/stop reporting (QueryResult.java:31-73): the
        # longest verbatim token run per surviving hit, with its offset
        # on both sides — computed only for the top-k rows
        from raydedup.stages.lcs import matched_segments

        seg_pairs = pa.table(
            {
                "a": pa.array(df["query_doc_id"].to_numpy(dtype=np.int64)),
                "b": pa.array(df["match_doc_id"].to_numpy(dtype=np.int64)),
            }
        )
        seg = matched_segments(seg_pairs, union_docs, cfg).to_pandas()
        seg = seg.rename(
            columns={
                "a": "query_doc_id",
                "b": "match_doc_id",
                "a_start": "query_start_token",
                "b_start": "match_start_token",
            }
        ).drop_duplicates(["query_doc_id", "match_doc_id"])
        df = df.merge(seg, on=["query_doc_id", "match_doc_id"], how="left")
        cols += seg_cols
    return df[cols]


def monitor_text(
    index_dir: str,
    text: str,
    cfg: DedupConfig | None = None,
    window_tokens: int = 200,
    step_tokens: int = 160,
) -> pd.DataFrame:
    """``panako monitor``: chop a long text into overlapping token
    windows (25 s / 20 s-step analog, ``OlafStrategy.java:561-573``) and
    containment-match every window against the INDEX via a winnowed-
    fingerprint posting exchange (the per-window index lookup,
    ``PanakoStorageKV.java:293-379``) — the index docs are fingerprinted
    in a distributed map and co-partitioned with the window fingerprints
    by key; nothing but the (window, doc) hit counts reaches the driver.
    coverage >= cfg.containment_min_coverage gates a hit. Returns
    (win_start_token, win_stop_token, match_doc_id, match_url,
    coverage)."""
    import ray

    from raydedup.stages.containment import fingerprint_postings, winnowed_fingerprints
    from raydedup.stages.exchange import hash_exchange_join

    cfg = cfg or DedupConfig()
    tokens = text.split()
    windows = []
    for start in range(0, max(1, len(tokens) - window_tokens + step_tokens), step_tokens):
        chunk = " ".join(tokens[start : start + window_tokens])
        if chunk:
            windows.append((start, min(start + window_tokens, len(tokens)), chunk))

    w, s = cfg.containment_window, cfg.containment_stride
    win_rows = {"win_id": [], "fp_key": []}
    win_meta = []  # (start, stop, n_fp)
    for wid, (start, stop, chunk) in enumerate(windows):
        qf = winnowed_fingerprints(chunk, w, s)
        win_meta.append((start, stop, qf.shape[0]))
        win_rows["win_id"].extend([wid] * qf.shape[0])
        win_rows["fp_key"].extend(qf.view(np.int64).tolist())
    if not win_rows["win_id"]:
        return pd.DataFrame(
            columns=["win_start_token", "win_stop_token", "match_doc_id", "match_url", "coverage"]
        )
    win_tbl = pa.table(
        {
            "fp_key": pa.array(win_rows["fp_key"], type=pa.int64()),
            "win_id": pa.array(win_rows["win_id"], type=pa.int64()),
        }
    )

    idx_docs = rd.read_parquet(
        os.path.join(index_dir, "docs"), columns=["doc_id", "text", "url"]
    )
    idx_post = fingerprint_postings(
        idx_docs.select_columns(["doc_id", "text"]), cfg
    ).select_columns(["fp_key", "doc_id"])

    def count_hits(wt: pa.Table, it: pa.Table) -> pa.Table:
        # per-bucket (win, doc) shared-fingerprint counts: both sides'
        # posting sets are unique per (owner, key), so one joined row ==
        # one shared fingerprint
        if wt.num_rows == 0 or it.num_rows == 0:
            return pa.table(
                {"win_id": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "shared": pa.array([], pa.int64())}
            )
        ik = it.column("fp_key").to_numpy(zero_copy_only=False)
        idoc = it.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.argsort(ik, kind="stable")
        ik, idoc = ik[order], idoc[order]
        wk = wt.column("fp_key").to_numpy(zero_copy_only=False)
        wwin = wt.column("win_id").to_numpy(zero_copy_only=False)
        lo = np.searchsorted(ik, wk, side="left")
        hi = np.searchsorted(ik, wk, side="right")
        reps = hi - lo
        if reps.sum() == 0:
            return pa.table(
                {"win_id": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64()),
                 "shared": pa.array([], pa.int64())}
            )
        wins = np.repeat(wwin, reps)
        pos = np.concatenate([np.arange(l, h) for l, h in zip(lo, hi) if h > l])
        docs_m = idoc[pos]
        order2 = np.lexsort((docs_m, wins))
        wins, docs_m = wins[order2], docs_m[order2]
        b = np.empty(wins.shape[0], dtype=bool)
        b[0] = True
        b[1:] = (wins[1:] != wins[:-1]) | (docs_m[1:] != docs_m[:-1])
        st = np.flatnonzero(b)
        cnt = np.diff(np.append(st, wins.shape[0]))
        return pa.table(
            {
                "win_id": pa.array(wins[st], type=pa.int64()),
                "doc_id": pa.array(docs_m[st], type=pa.int64()),
                "shared": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    refs = hash_exchange_join([ray.put(win_tbl)], idx_post, "fp_key", "fp_key", count_hits)
    parts = [t for t in ray.get(refs) if t.num_rows]
    if not parts:
        return pd.DataFrame(
            columns=["win_start_token", "win_stop_token", "match_doc_id", "match_url", "coverage"]
        )
    hits = pa.concat_tables(parts).to_pandas()
    # combine partial counts across buckets (a (win, doc) pair's keys can
    # land in several buckets)
    hits = hits.groupby(["win_id", "doc_id"], as_index=False)["shared"].sum()
    meta = pd.DataFrame(win_meta, columns=["start", "stop", "n_fp"])
    hits["coverage"] = hits["shared"] / hits["win_id"].map(meta["n_fp"]).clip(lower=1)
    hits = hits[hits["coverage"] >= cfg.containment_min_coverage]
    if hits.empty:
        return pd.DataFrame(
            columns=["win_start_token", "win_stop_token", "match_doc_id", "match_url", "coverage"]
        )

    # attach urls for the matched doc ids only
    m_ids = np.sort(hits["doc_id"].unique().astype(np.int64))
    ids_ref = ray.put(m_ids)

    def keep(t: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(np.isin(ids, wanted)))

    url_df = (
        idx_docs.select_columns(["doc_id", "url"])
        .map_batches(keep, batch_format="pyarrow")
        .to_pandas()
    )
    urls = dict(zip(url_df["doc_id"].astype(int), url_df["url"]))
    out = pd.DataFrame(
        {
            "win_start_token": hits["win_id"].map(meta["start"]).astype(int),
            "win_stop_token": hits["win_id"].map(meta["stop"]).astype(int),
            "match_doc_id": hits["doc_id"].astype(np.int64),
            "match_url": hits["doc_id"].astype(int).map(urls),
            "coverage": hits["coverage"].astype(float),
        }
    )
    return out.sort_values(
        ["win_start_token", "match_doc_id"], kind="mergesort"
    ).reset_index(drop=True)


def load_index(
    index_dir: str,
    src_index_dir: str,
    cfg: DedupConfig | None = None,
    *,
    force: bool = False,
) -> dict:
    """``panako load`` (``strategy/olaf/OlafStrategy.java:623-664``,
    ``cli/Load.java``): bulk-import an externally-produced index — a
    docs/ + signatures/ Parquet set, e.g. another engine run's store —
    into an existing index, skipping doc_ids already present.

    Semantics mirror the reference's cached-fingerprint import: already-
    present resources are skipped (the ``hasResource`` check becomes a
    doc_id anti-join), everything else is appended as new shards, and
    the manifest records each imported source shard so a re-load is a
    no-op (resume lineage, same as store).

    Signatures are only comparable under the same shingle/minhash
    config, so a source manifest carrying a DIFFERENT config hash is
    refused unless ``force=True`` (the reference trusts cache files
    blindly; refusing is the safe default when the config is encoded in
    the payload). A source without a manifest is trusted as-is.

    Scale note: the present-id set is gathered to the driver as one
    sorted int64 array (8 B/doc — fine into the billions, same envelope
    as delete_from_index); at 10^12 ids this verb would switch to a
    per-bucket hash-exchange anti-join over the shard files.
    """
    from raydedup.state.checkpoint import CheckpointManager, _atomic_write_table

    cfg = cfg or DedupConfig()
    mgr = CheckpointManager(index_dir, cfg)

    src_manifest = os.path.join(src_index_dir, "manifest.json")
    if os.path.exists(src_manifest):
        import json

        with open(src_manifest) as f:
            src_hash = json.load(f).get("config_hash")
        if src_hash and src_hash != mgr.cfg_hash and not force:
            raise ValueError(
                f"source index config_hash {src_hash} != destination "
                f"{mgr.cfg_hash}: signatures are not comparable across "
                "configs (pass force=True to import anyway)"
            )

    src_docs = sorted(glob.glob(os.path.join(src_index_dir, "docs", "*.parquet")))
    if not src_docs:
        raise FileNotFoundError(f"no docs/*.parquet under {src_index_dir}")

    # present-id gather: one column-pruned parallel read per dest shard
    @ray.remote
    def _ids_of(path: str) -> np.ndarray:
        t = pq.read_table(path, columns=["doc_id"])
        return np.unique(t.column("doc_id").to_numpy(zero_copy_only=False))

    dest_files = sorted(glob.glob(os.path.join(index_dir, "docs", "*.parquet")))
    parts = ray.get([_ids_of.remote(f) for f in dest_files])
    present = (
        np.unique(np.concatenate(parts)) if parts else np.empty(0, dtype=np.int64)
    )
    present_ref = ray.put(present)

    @ray.remote
    def _import_shard(
        pres: np.ndarray, docs_f: str, sigs_f: str, dst_docs: str, dst_sigs: str
    ) -> tuple[int, int]:
        dt = pq.read_table(docs_f)
        ids = dt.column("doc_id").to_numpy(zero_copy_only=False)
        keep = ~np.isin(ids, pres)
        n_new, n_skip = int(keep.sum()), int((~keep).sum())
        if n_new == 0:
            return 0, n_skip
        _atomic_write_table(dt.filter(pa.array(keep)), dst_docs)
        st = pq.read_table(sigs_f)
        sids = st.column("doc_id").to_numpy(zero_copy_only=False)
        _atomic_write_table(st.filter(pa.array(~np.isin(sids, pres))), dst_sigs)
        return n_new, n_skip

    from raydedup.state.checkpoint import shard_file_tag

    futs: dict = {}
    skipped_shards = 0
    for df_path in src_docs:
        st = os.stat(df_path)
        key = f"load:{os.path.basename(src_index_dir.rstrip(os.sep))}:{os.path.basename(df_path)}:{st.st_size}"
        if mgr.shard_done(key):
            skipped_shards += 1
            continue
        sig_path = os.path.join(src_index_dir, "signatures", os.path.basename(df_path))
        if not os.path.exists(sig_path):
            raise FileNotFoundError(f"missing signature shard for {df_path}")
        tag = shard_file_tag(key)
        futs[
            _import_shard.remote(
                present_ref,
                df_path,
                sig_path,
                mgr.path("docs", f"shard={tag}.parquet"),
                mgr.path("signatures", f"shard={tag}.parquet"),
            )
        ] = (key, tag, df_path)

    loaded_docs = skipped_docs = loaded_shards = 0
    for ref, (key, tag, src_f) in futs.items():
        n_new, n_skip = ray.get(ref)
        loaded_docs += n_new
        skipped_docs += n_skip
        loaded_shards += 1
        mgr.mark_shard(key, shard=tag, n_docs=n_new, source=src_f, imported=True)
    return {
        "loaded_docs": loaded_docs,
        "skipped_docs": skipped_docs,
        "loaded_shards": loaded_shards,
        "skipped_shards": skipped_shards,
        "index_dir": index_dir,
    }


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
