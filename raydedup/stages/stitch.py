"""Document stitch detection: tail-of-A equals head-of-B overlap.

The page-continuation signal: an article split across crawl pages (or a
truncated copy that resumes elsewhere) shows up as doc A's last ``k``
tokens exactly matching doc B's first ``k`` tokens — a directed (a, b)
edge a curation run uses to re-join split documents before dedup (the
time-offset-chain acceptance of the reference's matcher,
``util/Key.java:187-209``, reduced to its boundary case: the aligned
run sits at the ends of both docs).

Scale shape: ONE exchange.

1. per-batch combiner reuses the signature front half
   (``batch_word_hashes`` + ``rolling_hash_segments``): each doc with
   >= k tokens emits exactly two hash-only rows — (tail-k-gram hash,
   side=0) and (head-k-gram hash, side=1). No strings, O(docs) rows.
2. the exchange co-locates equal k-gram hashes; each bucket builds the
   side-0 x side-1 cross product per key-run with the size-class
   gather arithmetic (global pair index -> div/mod — no per-run Python
   loop), capping runs at ``max_run`` postings per side with counted
   drops (a viral k-gram is boilerplate, not a stitch; same cap
   discipline as the LSH candidate stage).

Hash equality stands in for token equality (the engine-wide accepted
collision class); the SQL mirror joins the literal k-token strings.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from raydedup.hashing import mix64, rolling_hash_u64

logger = logging.getLogger(__name__)

U64 = np.uint64
I64 = np.int64

_POST_SCHEMA = pa.schema(
    [("key", pa.int64()), ("side", pa.int8()), ("doc_id", pa.int64())]
)
OUT_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _head_tail_partial(t: pa.Table, k: int) -> pa.Table:
    """batch -> two (key, side, doc_id) rows per doc with >= k tokens:
    side 0 = tail k-gram, side 1 = head k-gram."""
    import pyarrow.compute as pc

    from raydedup.stages.signatures import (
        _WORD_CACHE,
        batch_word_hashes,
        rolling_hash_segments,
        tokenize,
    )

    if t.num_rows == 0 or t.num_columns == 0:
        return _POST_SCHEMA.empty_table()
    texts = pc.fill_null(t.column("text").combine_chunks(), "")
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    ascii_mask = pc.string_is_ascii(texts).to_numpy(zero_copy_only=False)
    keys, sides, docs = [], [], []
    if ascii_mask.any():
        flat, offs = batch_word_hashes(texts.filter(pa.array(ascii_mask)))
        h, ws, we = rolling_hash_segments(flat, offs, k)
        ok = we > ws
        fid = ids[ascii_mask][ok]
        head = mix64(h[ws[ok]])
        tail = mix64(h[we[ok] - 1])
        keys += [tail, head]
        sides += [np.zeros(fid.shape[0], np.int8), np.ones(fid.shape[0], np.int8)]
        docs += [fid, fid]
    if not ascii_mask.all():
        txts = texts.to_pylist()
        for d in np.flatnonzero(~ascii_mask):
            wh = _WORD_CACHE.hash_words(tokenize(txts[d]))
            if wh.shape[0] < k:
                continue
            hw = mix64(rolling_hash_u64(wh, k))
            keys += [hw[-1:], hw[:1]]
            sides += [np.zeros(1, np.int8), np.ones(1, np.int8)]
            docs += [np.full(1, ids[d], I64), np.full(1, ids[d], I64)]
    if not keys:
        return _POST_SCHEMA.empty_table()
    return pa.table(
        {
            "key": pa.array(np.concatenate(keys).view(I64), pa.int64()),
            "side": pa.array(np.concatenate(sides), pa.int8()),
            "doc_id": pa.array(np.concatenate(docs), pa.int64()),
        }
    )


def stitch_pairs(
    docs: Dataset,
    *,
    k: int = 8,
    max_run: int = 64,
) -> pa.Table:
    """docs(doc_id, text) -> directed (a, b) pairs where a's last k
    tokens equal b's first k tokens (a != b), sorted by (a, b)."""
    from raydedup.stages.exchange import hash_exchange_apply

    def bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return OUT_SCHEMA.empty_table()
        key = t.column("key").to_numpy(zero_copy_only=False)
        side = t.column("side").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((doc, side, key))
        key, side, doc = key[order], side[order], doc[order]
        new = np.empty(key.shape[0], dtype=bool)
        new[0] = True
        new[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], key.shape[0])
        # side 0 sorts first within each run
        s1 = starts + np.add.reduceat(
            (side == 0).astype(I64), starts
        )  # first side-1 position per run
        n0 = (s1 - starts).astype(I64)
        n1 = (ends - s1).astype(I64)
        over = (n0 > max_run) | (n1 > max_run)
        if over.any():
            # worker-side accounting: a viral k-gram is boilerplate,
            # not a stitch — drops are counted, never silent
            logger.warning("stitch: dropped %d over-cap key runs", int(over.sum()))
            n0 = np.where(over, 0, n0)
            n1 = np.where(over, 0, n1)
        npairs = n0 * n1
        total = int(npairs.sum())
        if total == 0:
            return OUT_SCHEMA.empty_table()
        # global pair index -> (run, a offset, b offset) via div/mod
        r_of = np.repeat(np.arange(starts.shape[0], dtype=I64), npairs)
        excl = np.concatenate([[0], np.cumsum(npairs)[:-1]]).astype(I64)
        j = np.arange(total, dtype=I64) - excl[r_of]
        a = doc[starts[r_of] + j // n1[r_of]]
        b = doc[s1[r_of] + j % n1[r_of]]
        keep = a != b
        return pa.table(
            {"a": pa.array(a[keep], pa.int64()), "b": pa.array(b[keep], pa.int64())}
        )

    parts = docs.select_columns(["doc_id", "text"]).map_batches(
        lambda t: _head_tail_partial(t, k), batch_format="pyarrow"
    )
    out = hash_exchange_apply(parts, "key", bucket)
    if out.num_rows == 0:
        return OUT_SCHEMA.empty_table()
    a = out.column("a").to_numpy(zero_copy_only=False)
    b = out.column("b").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    return pa.table(
        {"a": pa.array(a[order], pa.int64()), "b": pa.array(b[order], pa.int64())}
    )


CHAIN_SCHEMA = pa.schema(
    [("chain_id", pa.int64()), ("pos", pa.int64()), ("doc_id", pa.int64())]
)


def stitch_chains(
    docs: Dataset,
    *,
    k: int = 8,
    max_run: int = 64,
    max_len: int = 1024,
) -> pa.Table:
    """Reassembled page chains: (chain_id, pos, doc_id) reading order.

    Over the directed stitch edge set, only UNAMBIGUOUS edges survive
    (a has exactly one successor and b exactly one predecessor — a
    boilerplate tail matching many heads is noise, not a continuation);
    the remainder is a union of simple paths and cycles. Chains are
    emitted from each head (a doc that is nobody's continuation),
    chain_id = head doc_id; pure cycles have no head and emit nothing
    (two identical docs pointing at each other are dedup's business,
    not stitching's). ``max_len`` bounds the walk against pathological
    chains.

    The edge set is the stitch report (O(continuations), driver-small);
    the walk is vectorized across chains — one searchsorted round per
    chain POSITION, not per chain.
    """
    edges = stitch_pairs(docs, k=k, max_run=max_run)
    if edges.num_rows == 0:
        return CHAIN_SCHEMA.empty_table()
    a = edges.column("a").to_numpy(zero_copy_only=False)
    b = edges.column("b").to_numpy(zero_copy_only=False)
    # unique successor / unique predecessor filter
    ua, ca = np.unique(a, return_counts=True)
    ub, cb = np.unique(b, return_counts=True)
    ok_a = np.isin(a, ua[ca == 1])
    ok_b = np.isin(b, ub[cb == 1])
    a, b = a[ok_a & ok_b], b[ok_a & ok_b]
    if a.shape[0] == 0:
        return CHAIN_SCHEMA.empty_table()
    order = np.argsort(a, kind="stable")
    a_s, b_s = a[order], b[order]
    heads = a_s[~np.isin(a_s, b_s)]
    if heads.shape[0] == 0:
        return CHAIN_SCHEMA.empty_table()
    chains, poss, docs_out = [], [], []
    cur = heads.copy()
    cid = heads.copy()
    pos = 0
    while cur.shape[0] and pos < max_len:
        chains.append(cid)
        poss.append(np.full(cur.shape[0], pos, dtype=np.int64))
        docs_out.append(cur)
        nxt = np.searchsorted(a_s, cur)
        nxt[nxt == a_s.shape[0]] = 0
        hit = a_s[nxt] == cur
        cid, cur = cid[hit], b_s[nxt[hit]]
        pos += 1
    if cur.shape[0]:
        # drops are counted, never silent (same discipline as the
        # over-cap run drops in stitch_pairs)
        logger.warning(
            "stitch_chains: %d chains truncated at max_len=%d",
            int(cur.shape[0]),
            max_len,
        )
    out = pa.table(
        {
            "chain_id": pa.array(np.concatenate(chains), pa.int64()),
            "pos": pa.array(np.concatenate(poss), pa.int64()),
            "doc_id": pa.array(np.concatenate(docs_out), pa.int64()),
        }
    )
    idx = np.lexsort(
        (out.column("pos").to_numpy(), out.column("chain_id").to_numpy())
    )
    return out.take(pa.array(idx))


MERGED_SCHEMA = pa.schema(
    [
        ("chain_id", pa.int64()),
        ("n_parts", pa.int64()),
        ("text", pa.large_string()),
    ]
)


def stitch_merge(
    docs: Dataset,
    *,
    k: int = 8,
    max_run: int = 64,
    max_len: int = 1024,
) -> pa.Table:
    """Materialize reassembled documents: each stitch chain becomes ONE
    merged text — the head doc's tokens followed by each continuation's
    tokens with its first ``k`` (the overlap that proved the join)
    dropped, re-joined with single spaces (whitespace-normalizing, the
    chunking convention). Output (chain_id, n_parts, text), chain_id =
    head doc_id, ordered by chain_id.

    Member texts are fetched with ONE semi-join pass over the corpus
    (chain membership broadcast as a sorted (doc_id -> chain_id, pos)
    map — chains are the report-sized stitch output, never O(corpus)),
    then MERGED PER CHAIN inside a chain_id-keyed exchange: each bucket
    kernel sees all of its chains' member texts and nothing else, so
    driver memory is O(merged output), not O(all stitched member text)
    (ADVICE r3 — a pagination-heavy corpus with long chains never
    accumulates its raw member texts on the driver).
    """
    import ray

    from raydedup.stages.exchange import hash_exchange_apply

    chains = stitch_chains(docs, k=k, max_run=max_run, max_len=max_len)
    if chains.num_rows == 0:
        return MERGED_SCHEMA.empty_table()
    mem_ids = chains.column("doc_id").to_numpy(zero_copy_only=False)
    m_order = np.argsort(mem_ids, kind="stable")
    member = mem_ids[m_order]
    m_chain = chains.column("chain_id").to_numpy(zero_copy_only=False)[m_order]
    m_pos = chains.column("pos").to_numpy(zero_copy_only=False)[m_order]
    member_ref = ray.put((member, m_chain, m_pos))

    _MEMBER_SCHEMA = pa.schema(
        [
            ("chain_id", pa.int64()),
            ("pos", pa.int64()),
            ("text", pa.large_string()),
        ]
    )

    def fetch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0 or t.num_columns == 0:
            return _MEMBER_SCHEMA.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        mem, mc, mp = ray.get(member_ref)
        pos = np.searchsorted(mem, ids)
        pos[pos == mem.shape[0]] = 0
        hit = mem[pos] == ids
        kept = t.filter(pa.array(hit))
        sel = pos[hit]
        return pa.table(
            {
                "chain_id": pa.array(mc[sel], pa.int64()),
                "pos": pa.array(mp[sel], pa.int64()),
                "text": pc.cast(
                    pc.fill_null(kept.column("text"), ""), pa.large_string()
                ),
            }
        )

    def merge_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return MERGED_SCHEMA.empty_table()
        cid = t.column("chain_id").to_numpy(zero_copy_only=False)
        pos = t.column("pos").to_numpy(zero_copy_only=False)
        order = np.lexsort((pos, cid))
        cid = cid[order]
        texts = t.take(pa.array(order)).column("text").to_pylist()
        new = np.empty(cid.shape[0], dtype=bool)
        new[0] = True
        new[1:] = cid[1:] != cid[:-1]
        starts = np.flatnonzero(new)
        sizes = np.diff(np.append(starts, cid.shape[0]))
        heads, n_parts, merged = [], [], []
        for s, n in zip(starts, sizes):
            toks: list[str] = []
            for j in range(s, s + n):
                part = texts[j].split()
                toks.extend(part[k:] if j > s else part)
            heads.append(int(cid[s]))
            n_parts.append(int(n))
            merged.append(" ".join(toks))
        return pa.table(
            {
                "chain_id": pa.array(heads, pa.int64()),
                "n_parts": pa.array(n_parts, pa.int64()),
                "text": pa.array(merged, pa.large_string()),
            }
        )

    members = docs.select_columns(["doc_id", "text"]).map_batches(
        fetch, batch_format="pyarrow"
    )
    out = hash_exchange_apply(members, "chain_id", merge_bucket)
    if out.num_rows == 0 or out.num_columns == 0:
        return MERGED_SCHEMA.empty_table()
    order = np.argsort(out.column("chain_id").to_numpy(zero_copy_only=False))
    return out.take(pa.array(order))
