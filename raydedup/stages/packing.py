"""Greedy token-budget sequence packing — assemble documents into
fixed-budget training sequences.

The last mile of every LLM-training-data pipeline: after curation the
corpus must be laid out as sequences of at most ``budget`` tokens, each
a concatenation of whole documents (packing; docs are never split).
There is no reference analog — the reference's output is match records
— but the north-star pipeline ends in a training-ready sink, and this
is that sink's layout step.

Distributed semantics (partition-local greedy, the layout real
pipelines use): docs hash to ``n_buckets`` shards by ``mix64(doc_id)``,
and packing runs independently per shard in deterministic ``doc_id``
order. Pack identity is therefore a pure function of (corpus, budget,
n_buckets) — independent of block layout or execution order — and the
operator is ONE exchange of 24-byte (doc_id, bucket, n_tokens) rows:
token counts are computed row-local BEFORE the shuffle, so document
text never moves.

Greedy rule (mirrored exactly by the recursive-CTE SQL oracle): a doc
opens a new pack iff the running token count is positive and would
exceed ``budget`` with it; an oversized doc (> budget tokens) gets a
pack of its own rather than being split. The per-shard kernel finds
pack boundaries with O(#packs) scalar ``searchsorted`` calls on one
cumulative-sum array — no per-doc Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from raydedup.hashing import U64, mix64

I64 = np.int64

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("bucket", pa.int64()),
        ("pack_id", pa.int64()),
        ("pack_pos", pa.int64()),
        ("n_tokens", pa.int64()),
    ]
)


def greedy_pack_bounds(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Start indices of each pack over ``tokens`` (already in pack
    order). Greedy first-fit: extend the current pack while the running
    sum stays within ``budget``; a doc alone over budget still forms a
    (single-doc) pack."""
    n = tokens.shape[0]
    if n == 0:
        return np.zeros(0, dtype=I64)
    cum = np.cumsum(tokens.astype(I64))
    starts = [0]
    i = 0
    while True:
        base = cum[i - 1] if i else 0
        j = int(np.searchsorted(cum, base + budget, side="right"))
        if j <= i:  # oversized doc: its own pack
            j = i + 1
        if j >= n:
            break
        starts.append(j)
        i = j
    return np.asarray(starts, dtype=I64)


def pack_sequences(
    docs: Dataset,
    *,
    budget: int = 2048,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """(doc_id, bucket, pack_id, pack_pos, n_tokens) for every doc:
    which training sequence it lands in and where. ``pack_id`` counts
    from 0 within each bucket."""
    from raydedup.stages.exchange import hash_exchange_apply
    from raydedup.stages.textstats import token_count_batch

    def keyed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema(
                [("doc_id", pa.int64()), ("bucket", pa.int64()), ("n_tokens", pa.int64())]
            ).empty_table()
        import pyarrow.compute as pc

        t = t.set_column(
            t.schema.get_field_index(text_col),
            text_col,
            pc.fill_null(t.column(text_col), ""),
        )
        tok = token_count_batch(t.select([id_col, text_col]), text_col=text_col)
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(I64)
        bucket = (mix64(ids.view(U64)) % U64(n_buckets)).astype(I64)
        return pa.table(
            {
                "doc_id": ids,
                "bucket": bucket,
                "n_tokens": tok.column("n_tokens"),
            }
        )

    def pack_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _OUT_SCHEMA.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        buckets = t.column("bucket").to_numpy(zero_copy_only=False)
        toks = t.column("n_tokens").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, buckets))
        ids, buckets, toks = ids[order], buckets[order], toks[order]
        pack_id = np.empty(ids.shape[0], dtype=I64)
        pack_pos = np.empty(ids.shape[0], dtype=I64)
        # a reduce bucket can hold several hash buckets: pack each
        # bucket's contiguous run independently
        bnd = np.flatnonzero(np.diff(buckets)) + 1
        for s, e in zip(np.r_[0, bnd], np.r_[bnd, ids.shape[0]]):
            starts = greedy_pack_bounds(toks[s:e], budget)
            sizes = np.diff(np.r_[starts, e - s])
            pack_id[s:e] = np.repeat(np.arange(starts.shape[0], dtype=I64), sizes)
            pack_pos[s:e] = np.arange(e - s, dtype=I64) - np.repeat(starts, sizes)
        return pa.table(
            {
                "doc_id": ids,
                "bucket": buckets,
                "pack_id": pack_id,
                "pack_pos": pack_pos,
                "n_tokens": toks,
            }
        )

    keyed_ds = docs.select_columns([id_col, text_col]).map_batches(
        keyed, batch_format="pyarrow"
    )
    out = hash_exchange_apply(keyed_ds, "bucket", pack_bucket)
    if out.num_rows == 0 or out.num_columns == 0:
        return _OUT_SCHEMA.empty_table()
    return out.take(
        pa.compute.sort_indices(out, sort_keys=[("doc_id", "ascending")])
    )
