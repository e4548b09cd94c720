"""Prefix-filter similarity self-join (AllPairs / PPJoin family).

An EXACT, LSH-free alternative candidate path for the flagship
Jaccard-τ self-join (`cli/Deduplication.java:90-108` store+monitor-all):
where `stages/candidates.py` trades recall for bounded work via MinHash
banding, this stage is lossless — every pair with shingle-set Jaccard
≥ τ is guaranteed to surface as a candidate (Chaudhuri/Bayardo prefix
filtering, public knowledge), then exact verification keeps exactly the
qualifying pairs. Useful when the north rule's recall bar is 1.0, and
as a same-semantics cross-check of the LSH path at any scale.

Why it is lossless: under ANY consistent total order on shingle hashes,
two sets A, B with J(A,B) ≥ τ satisfy |A∩B| ≥ ceil(τ·max(|A|,|B|)), and
sets sharing ≥ o elements must collide within their first
``|X| - o + 1`` ordered elements. We order by (df ASC, hash ASC) —
rarest-first, the AllPairs ordering — so prefixes concentrate on rare
shingles and hot boilerplate shingles sink to the suffix where they
never generate postings. The df table is only a selectivity optimizer:
hashes absent from the broadcast default to df=1, preserving a total
order and hence correctness, which is what lets the broadcast be capped
(``max_hot_vocab`` most-frequent df≥2 hashes) at corpus scale.

Scale shape: one token-hash exchange for df, one stateless prefix
posting pass (per-batch, fully vectorized: ONE doc-major lexsort per
batch), one posting exchange emitting a<b pairs per hash run
(triangular expansion in pure index arithmetic; runs above
``max_run_postings`` are dropped and COUNTED — same hot-key policy as
`max_band_postings`, surfaced in the returned metrics), one pair-dedup
exchange, then the existing `verify_pairs_exchange` two-round packed
join. Raw text never enters an exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from raydedup.config import DedupConfig

U64 = np.uint64
I64 = np.int64

_POST_SCHEMA = pa.schema(
    [("h", pa.int64()), ("doc_id", pa.int64()), ("size", pa.int64())]
)
_PAIR_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _batch_sets(t: pa.Table, cfg: DedupConfig):
    """batch -> (doc_ids i64, flat u64 hashes, lens) of sorted-unique
    per-doc shingle sets (the pipeline's own batch kernel)."""
    from raydedup.stages.signatures import batch_shingle_sets

    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    col = t.column("text")
    sets = batch_shingle_sets(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, cfg
    )
    lens = np.fromiter((s.shape[0] for s in sets), dtype=I64, count=len(sets))
    flat = np.concatenate(sets) if sets else np.empty(0, dtype=U64)
    return ids, flat, lens


def _df_hot_table(docs: Dataset, cfg: DedupConfig, max_hot_vocab: int) -> pa.Table:
    """(h, df) for shingle hashes in ≥ 2 docs, capped to the
    ``max_hot_vocab`` most frequent (ties -> smaller hash kept)."""
    from raydedup.stages.exchange import hash_exchange_apply

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"h": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
        _, flat, _ = _batch_sets(t, cfg)
        u, c = np.unique(flat, return_counts=True)
        return pa.table(
            {"h": pa.array(u.view(I64), pa.int64()), "c": pa.array(c.astype(I64), pa.int64())}
        )

    def reduce_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"h": pa.array([], pa.int64()), "df": pa.array([], pa.int64())})
        h = t.column("h").to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        order = np.argsort(h, kind="stable")
        h, c = h[order], c[order]
        first = np.empty(h.shape[0], dtype=bool)
        first[0] = True
        first[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(first)
        df = np.add.reduceat(c, starts)
        hot = df >= 2
        return pa.table(
            {
                "h": pa.array(h[starts][hot], pa.int64()),
                "df": pa.array(df[hot].astype(I64), pa.int64()),
            }
        )

    prepped = docs.select_columns(["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    hot = hash_exchange_apply(prepped, "h", reduce_bucket)
    if hot.num_rows == 0 or hot.num_columns == 0:
        # fully-empty docs: the exchange's no-donor path yields a
        # 0-COLUMN table — substitute the typed empty (h, df) table
        return pa.table({"h": pa.array([], pa.int64()), "df": pa.array([], pa.int64())})
    if hot.num_rows > max_hot_vocab:
        df = hot.column("df").to_numpy(zero_copy_only=False)
        h = hot.column("h").to_numpy(zero_copy_only=False)
        keep = np.lexsort((h, -df))[:max_hot_vocab]
        hot = hot.take(pa.array(np.sort(keep)))
    return hot


def _emit_pairs_bucket(t: pa.Table, max_run: int, tau: float) -> pa.Table:
    """One posting bucket -> partially-deduped (a, b) candidate pairs.
    Runs with more than ``max_run`` postings are dropped and returned
    as ONE sentinel row (a=-1, b=dropped-run count) for the caller's
    drop accounting (no silent caps)."""
    if t.num_rows == 0 or t.num_columns == 0:
        return _PAIR_SCHEMA.empty_table()
    h = t.column("h").to_numpy(zero_copy_only=False)
    d = t.column("doc_id").to_numpy(zero_copy_only=False)
    sz = t.column("size").to_numpy(zero_copy_only=False)
    order = np.lexsort((d, h))
    h, d, sz = h[order], d[order], sz[order]
    n = h.shape[0]
    first = np.empty(n, dtype=bool)
    first[0] = True
    first[1:] = h[1:] != h[:-1]
    run_id = np.cumsum(first) - 1
    starts = np.flatnonzero(first)
    run_len = np.diff(starts, append=I64(n))
    dropped = int((run_len > max_run).sum())
    ok = np.repeat(run_len <= max_run, run_len)

    loc = np.arange(n, dtype=I64) - np.repeat(starts, run_len)
    loc = np.where(ok, loc, 0)
    # triangular expansion: element at local pos l pairs (as b) with its
    # l predecessors in the run — pure index arithmetic, no per-run loop
    b_idx = np.repeat(np.arange(n, dtype=I64), loc)
    excl = np.concatenate(([0], np.cumsum(loc)[:-1])).astype(I64)
    k = np.arange(int(loc.sum()), dtype=I64) - np.repeat(excl, loc)
    a_idx = np.repeat(np.arange(n, dtype=I64) - loc, loc) + k

    a, b = d[a_idx], d[b_idx]
    sa, sb = sz[a_idx], sz[b_idx]
    # docs are sorted within a run, so a<b; drop same-doc repeats (a doc
    # posts each hash once, so a==b cannot occur) and size-incompatible
    # pairs (J >= tau needs min >= tau*max; slack only ADMITS extras)
    keep = np.minimum(sa, sb) >= tau * np.maximum(sa, sb) - 1e-9
    a, b = a[keep], b[keep]
    if a.shape[0]:
        o = np.lexsort((b, a))
        a, b = a[o], b[o]
        uniq = np.empty(a.shape[0], dtype=bool)
        uniq[0] = True
        uniq[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        a, b = a[uniq], b[uniq]
    if dropped:
        a = np.concatenate((a, [-1]))
        b = np.concatenate((b, [dropped]))
    return pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})


def prefix_filter_pairs(
    docs: Dataset,
    cfg: DedupConfig | None = None,
    tau: float = 0.5,
    max_run_postings: int = 4096,
    max_hot_vocab: int = 4_000_000,
) -> tuple[pa.Table, dict]:
    """docs(doc_id, text) -> (verified pairs (a, b, jaccard >= tau)
    sorted by (a, b), metrics dict). Exact: equals the all-pairs
    Jaccard-τ join whenever ``dropped_runs == 0`` (the cap only fires
    on degenerate boilerplate runs; drops are counted, never silent)."""
    from raydedup.stages.exchange import hash_exchange_apply
    from raydedup.stages.verify import verify_pairs_exchange

    cfg = cfg or DedupConfig()
    proj = docs.select_columns(["doc_id", "text"])

    hot = _df_hot_table(proj, cfg, max_hot_vocab)
    hot_h = hot.column("h").to_numpy(zero_copy_only=False).copy()
    hot_df = hot.column("df").to_numpy(zero_copy_only=False).copy()
    o = np.argsort(hot_h, kind="stable")
    hot_ref = ray.put((hot_h[o], hot_df[o]))

    def prefix_postings(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _POST_SCHEMA.empty_table()
        ids, flat, lens = _batch_sets(t, cfg)
        total = int(lens.sum())
        if total == 0:
            return _POST_SCHEMA.empty_table()
        hh, hdf = ray.get(hot_ref)
        fi = flat.view(I64)
        pos = np.searchsorted(hh, fi)
        posc = np.minimum(pos, max(hh.shape[0] - 1, 0))
        found = (hh[posc] == fi) if hh.shape[0] else np.zeros(total, dtype=bool)
        dfk = np.where(found, hdf[posc] if hh.shape[0] else 0, 1)
        doc_idx = np.repeat(np.arange(ids.shape[0], dtype=I64), lens)
        order = np.lexsort((fi, dfk, doc_idx))
        starts = np.concatenate(([0], np.cumsum(lens)[:-1])).astype(I64)
        loc = np.arange(total, dtype=I64) - np.repeat(starts, lens)
        p = np.where(lens > 0, lens - np.maximum(1, np.floor(tau * lens).astype(I64)) + 1, 0)
        keep = loc < np.repeat(p, lens)
        sel = order[keep]
        return pa.table(
            {
                "h": pa.array(fi[sel], pa.int64()),
                "doc_id": pa.array(ids[doc_idx[sel]], pa.int64()),
                "size": pa.array(lens[doc_idx[sel]], pa.int64()),
            }
        )

    postings = proj.map_batches(prefix_postings, batch_format="pyarrow")
    raw = hash_exchange_apply(
        postings, "h", lambda t: _emit_pairs_bucket(t, max_run_postings, tau)
    )
    metrics = {"dropped_runs": 0, "n_candidates": 0}
    if raw.num_rows == 0:
        return (
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())}),
            metrics,
        )
    a = raw.column("a").to_numpy(zero_copy_only=False)
    sent = a == -1
    if sent.any():
        metrics["dropped_runs"] = int(
            raw.column("b").to_numpy(zero_copy_only=False)[sent].sum()
        )
        raw = raw.filter(pa.array(~sent))

    # cross-bucket dedup (a prefix-pair can surface under several hashes
    # landing in different buckets)
    from raydedup.stages.pair_agg import reduce_pair_table

    import ray.data as rd

    pairs_tbl = hash_exchange_apply(
        rd.from_arrow(raw),
        "a",
        lambda t: reduce_pair_table(t, sum_cols=[]),
    )
    metrics["n_candidates"] = pairs_tbl.num_rows
    if pairs_tbl.num_rows == 0:
        return (
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())}),
            metrics,
        )
    ids = np.unique(
        np.concatenate(
            [
                pairs_tbl.column("a").to_numpy(zero_copy_only=False),
                pairs_tbl.column("b").to_numpy(zero_copy_only=False),
            ]
        )
    )
    cfg_v = cfg.with_overrides(jaccard_tau=tau)
    verified = verify_pairs_exchange(rd.from_arrow(pairs_tbl), proj, cfg_v, ids)
    if verified.num_rows:
        va = verified.column("a").to_numpy(zero_copy_only=False)
        vb = verified.column("b").to_numpy(zero_copy_only=False)
        verified = verified.take(pa.array(np.lexsort((vb, va))))
    return verified, metrics
