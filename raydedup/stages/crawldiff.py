"""Crawl-snapshot diff: compare two captures of the same url space and
classify every url as added / removed / changed / unchanged.

The incremental-index surface (``cli/Store.java:119-127`` skip-if-
present freshness plus the delete verb's index subtraction,
``PanakoStorageKV.java`` remove path) expressed as ONE set operation
over two crawl snapshots: what must be (re)ingested (`added`,
`changed`), what can be dropped (`removed`), and what the resume path
skips (`unchanged`).

Scale shape: one two-sided hash exchange keyed on a stable string hash
of the url (``hash_exchange_join``); in-bucket the kernel is pure
array code — per-side keep-min-digest reduction (lexsort + first-run
mask, so duplicate captures of a url inside one snapshot are resolved
deterministically), then an np.unique merge of the two url sets.
Nothing lands on the driver; results stream out as per-bucket refs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

OUT_FIELDS = [
    ("url", pa.string()),
    ("status", pa.string()),
    ("old_digest", pa.int64()),
    ("new_digest", pa.int64()),
]


def _with_ukey(ds: Dataset, url_col: str, digest_col: str) -> Dataset:
    from raydedup.hashing import hash_strings_u64

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"_ukey": pa.array([], pa.int64())})
        key = hash_strings_u64(t.column(url_col).to_pylist(), mixed=True)
        return t.select([url_col, digest_col]).append_column(
            "_ukey", pa.array(key.view(np.int64), pa.int64())
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def _side_min_digest(t: pa.Table, url_col: str, digest_col: str):
    """(sorted url-hash keys, min digest per key, row position of one
    representative) — the deterministic keep-MIN-digest rule when a
    snapshot carries a url twice. All merging below runs on the int64
    keys (the per-row Python strings never materialize); a 64-bit
    collision between two distinct urls in one bucket would merge them
    — the same accepted odds as every hash-keyed exchange here."""
    keys = t.column("_ukey").to_numpy(zero_copy_only=False)
    dig = t.column(digest_col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((dig, keys))
    ks, ds_ = keys[order], dig[order]
    first = np.empty(ks.shape[0], dtype=bool)
    first[0] = True
    first[1:] = ks[1:] != ks[:-1]
    return ks[first], ds_[first], order[first]


def crawl_diff(
    old: Dataset,
    new: Dataset,
    url_col: str = "url",
    digest_col: str = "digest",
    num_buckets: int | None = None,
) -> Dataset:
    """Diff two snapshots -> (url, status, old_digest, new_digest).

    status: 'added' (new only), 'removed' (old only), 'changed' (both,
    digests differ), 'unchanged' (both, digests equal). The absent
    side's digest is null.
    """
    from raydedup.stages.exchange import hash_exchange_join, refs_to_dataset

    out_schema = pa.schema(OUT_FIELDS)

    def bucket(lt: pa.Table, rt: pa.Table) -> pa.Table:
        l_empty = lt.num_rows == 0 or lt.num_columns == 0
        r_empty = rt.num_rows == 0 or rt.num_columns == 0
        if l_empty and r_empty:
            return out_schema.empty_table()
        empty_i64 = np.empty(0, dtype=np.int64)
        if l_empty:
            ok, od, orow = empty_i64, empty_i64, empty_i64
        else:
            ok, od, orow = _side_min_digest(lt, url_col, digest_col)
        if r_empty:
            nk, nd, nrow = empty_i64, empty_i64, empty_i64
        else:
            nk, nd, nrow = _side_min_digest(rt, url_col, digest_col)
        # merged key universe; membership by searchsorted into each
        # sorted side (pure int64 compares)
        allk = np.unique(np.concatenate([ok, nk]))

        def member(sorted_k, probes):
            if sorted_k.shape[0] == 0:
                z = np.zeros(probes.shape[0], dtype=bool)
                return z, np.zeros(probes.shape[0], dtype=np.int64)
            pos = np.searchsorted(sorted_k, probes)
            pos_c = np.minimum(pos, sorted_k.shape[0] - 1)
            return (pos < sorted_k.shape[0]) & (sorted_k[pos_c] == probes), pos_c

        in_old, opos = member(ok, allk)
        in_new, npos = member(nk, allk)
        o_dig = np.where(in_old, od[opos] if od.shape[0] else 0, 0).astype(np.int64)
        n_dig = np.where(in_new, nd[npos] if nd.shape[0] else 0, 0).astype(np.int64)
        status = np.where(
            in_old & in_new,
            np.where(o_dig == n_dig, "unchanged", "changed"),
            np.where(in_new, "added", "removed"),
        )
        # recover the url STRING per merged key from whichever side has
        # it — one Arrow take per side, no per-row Python
        urls = pa.nulls(allk.shape[0], pa.string())
        if not r_empty and in_new.any():
            new_urls = rt.column(url_col).take(pa.array(nrow[npos[in_new]]))
            urls = pc.replace_with_mask(
                urls, pa.array(in_new), new_urls.combine_chunks()
                if isinstance(new_urls, pa.ChunkedArray)
                else new_urls,
            )
        old_only = in_old & ~in_new
        if not l_empty and old_only.any():
            old_urls = lt.column(url_col).take(pa.array(orow[opos[old_only]]))
            urls = pc.replace_with_mask(
                urls, pa.array(old_only), old_urls.combine_chunks()
                if isinstance(old_urls, pa.ChunkedArray)
                else old_urls,
            )
        return pa.table(
            {
                "url": pc.cast(urls, pa.string()),
                "status": pa.array(status.tolist(), type=pa.string()),
                "old_digest": pa.array(o_dig, type=pa.int64(), mask=~in_old),
                "new_digest": pa.array(n_dig, type=pa.int64(), mask=~in_new),
            }
        )

    refs = hash_exchange_join(
        _with_ukey(old, url_col, digest_col),
        _with_ukey(new, url_col, digest_col),
        "_ukey",
        "_ukey",
        bucket,
        num_buckets,
    )
    return refs_to_dataset(refs, out_schema)
