"""Content drift between two crawl snapshots: per-url exact Jaccard of
the old and new page text.

``crawl_diff`` answers WHICH urls changed (digest set algebra); this
stage answers HOW MUCH — the word-5-gram Jaccard between the two
versions of every url present in both snapshots (1.0 = unchanged
content, near 0 = a rewrite), the signal a recrawl scheduler or a
dedup-across-snapshots policy reads.

Scale shape: ONE two-sided url-hash exchange co-locates each url's two
versions; inside a bucket both sides dedup per url (keep the
lexicographically-smallest text — deterministic and SQL-expressible),
texts shingle via the flagship posting emission (distinct (sh, pair)
rows, <k-token docs contribute nothing), and per-pair intersection
counts come from one (pair, hash) lexsort — union = distinct rows,
inter = n_old + n_new - union. No driver materialization of texts;
output is one row per co-present url with both sides shingled.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from raydedup.hashing import hash_strings_u64

I64 = np.int64
U64 = np.uint64

OUT_SCHEMA = pa.schema(
    [
        ("url", pa.large_string()),
        ("n_old", pa.int64()),
        ("n_new", pa.int64()),
        ("n_common", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)

_SIDE_SCHEMA = pa.schema(
    [("key", pa.int64()), ("url", pa.large_string()), ("text", pa.large_string())]
)


def _side_partial(t: pa.Table, url_col: str, text_col: str) -> pa.Table:
    import pyarrow.compute as pc

    if t.num_rows == 0 or t.num_columns == 0:
        return _SIDE_SCHEMA.empty_table()
    url = pc.cast(pc.fill_null(t.column(url_col), ""), pa.large_string())
    key = hash_strings_u64(url.to_numpy(zero_copy_only=False))
    return pa.table(
        {
            "key": pa.array(key.view(I64), pa.int64()),
            "url": url,
            "text": pc.cast(pc.fill_null(t.column(text_col), ""), pa.large_string()),
        }
    )


def _dedup_side(t: pa.Table):
    """per url keep the lexicographically-smallest text; returns
    (key u64 array sorted, url Arrow array, text Arrow array).
    Duplicate urls are rare, so text comparison only runs inside
    duplicate-key runs — the bulk is one numpy argsort."""
    key = t.column("key").to_numpy(zero_copy_only=False).view(U64)
    order = np.argsort(key, kind="stable")
    ks = key[order]
    first = np.empty(ks.shape[0], dtype=bool)
    first[0] = True
    first[1:] = ks[1:] != ks[:-1]
    starts = np.flatnonzero(first)
    runs = np.diff(np.append(starts, ks.shape[0]))
    keep = order[starts].copy()
    dup = np.flatnonzero(runs > 1)
    if dup.shape[0]:
        texts = t.column("text")
        for r in dup:
            cand = order[starts[r] : starts[r] + runs[r]]
            keep[r] = min(cand, key=lambda i: texts[int(i)].as_py())
    sel = pa.array(keep, pa.int64())
    return (
        ks[starts],
        t.column("url").take(sel),
        t.column("text").take(sel),
    )


def content_drift(
    old_docs: Dataset,
    new_docs: Dataset,
    *,
    k: int = 5,
    url_col: str = "url",
    text_col: str = "text",
) -> pa.Table:
    """(url, n_old, n_new, n_common, jaccard) for every url present in
    BOTH snapshots whose both versions have >= 1 word-k-gram shingle,
    ordered by url."""
    from raydedup.stages.dupngrams import _posting_batches
    from raydedup.stages.exchange import hash_exchange_join

    def kern(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if (
            lt.num_rows == 0
            or lt.num_columns == 0
            or rt.num_rows == 0
            or rt.num_columns == 0
        ):
            return OUT_SCHEMA.empty_table()
        kold, uold, told = _dedup_side(lt)
        knew, unew, tnew = _dedup_side(rt)
        pos = np.searchsorted(kold, knew)
        pos[pos == kold.shape[0]] = 0
        hit = kold[pos] == knew
        if not hit.any():
            return OUT_SCHEMA.empty_table()
        oi = pos[hit]
        ni = np.flatnonzero(hit)
        n_pairs = oi.shape[0]
        pair_urls = unew.take(pa.array(ni, pa.int64()))
        po = _posting_batches(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n_pairs, dtype=I64), pa.int64()),
                    "text": told.take(pa.array(oi, pa.int64())),
                }
            ),
            k,
        )
        pn = _posting_batches(
            pa.table(
                {
                    "doc_id": pa.array(np.arange(n_pairs, dtype=I64), pa.int64()),
                    "text": tnew.take(pa.array(ni, pa.int64())),
                }
            ),
            k,
        )
        p_old = po.column("doc_id").to_numpy(zero_copy_only=False)
        p_new = pn.column("doc_id").to_numpy(zero_copy_only=False)
        n_old = np.bincount(p_old, minlength=n_pairs).astype(I64)
        n_new = np.bincount(p_new, minlength=n_pairs).astype(I64)
        P = np.concatenate([p_old, p_new])
        H = np.concatenate(
            [
                po.column("sh").to_numpy(zero_copy_only=False),
                pn.column("sh").to_numpy(zero_copy_only=False),
            ]
        )
        if P.shape[0] == 0:
            return OUT_SCHEMA.empty_table()
        order = np.lexsort((H, P))
        Ps, Hs = P[order], H[order]
        new = np.empty(Ps.shape[0], dtype=bool)
        new[0] = True
        new[1:] = (Ps[1:] != Ps[:-1]) | (Hs[1:] != Hs[:-1])
        union = np.bincount(Ps[new], minlength=n_pairs).astype(I64)
        inter = n_old + n_new - union
        ok = (n_old > 0) & (n_new > 0)
        jac = np.zeros(n_pairs, dtype=np.float64)
        jac[ok] = inter[ok] / union[ok]
        sel = pa.array(np.flatnonzero(ok), pa.int64())
        return pa.table(
            {
                "url": pair_urls.take(sel),
                "n_old": pa.array(n_old[ok], pa.int64()),
                "n_new": pa.array(n_new[ok], pa.int64()),
                "n_common": pa.array(inter[ok], pa.int64()),
                "jaccard": pa.array(jac[ok], pa.float64()),
            }
        )

    import ray

    refs = hash_exchange_join(
        old_docs.map_batches(
            lambda t: _side_partial(t, url_col, text_col), batch_format="pyarrow"
        ),
        new_docs.map_batches(
            lambda t: _side_partial(t, url_col, text_col), batch_format="pyarrow"
        ),
        "key",
        "key",
        kern,
    )
    tabs = [b for b in ray.get(refs) if b.num_rows]
    if not tabs:
        return OUT_SCHEMA.empty_table()
    out = pa.concat_tables(tabs)
    urls = out.column("url").to_pylist()
    idx = sorted(range(len(urls)), key=urls.__getitem__)
    return out.take(pa.array(idx, pa.int64()))
