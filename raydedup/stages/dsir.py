"""DSIR — Data Selection via Importance Resampling, in EXACT whole-bit
arithmetic.

The pipeline shape follows Xie et al., "Data Selection for Language
Models via Importance Resampling" (arXiv:2302.03169): score every raw
document by the log-likelihood ratio of its tokens under a TARGET
unigram distribution (the data you want more of) vs the RAW corpus
distribution, then keep the docs whose ratio favors the target. The
paper hashes n-grams into buckets; here the features are the repo's
canonical lowered whitespace unigrams (``stages/tfidf.py
_batch_doc_token_counts`` — the same tokens every other text operator
scores with), which at these vocabulary sizes need no lossy bucketing.

``ln`` of arbitrary doubles is not bit-identical across engines (the
oracle-parity rule — see ``stages/lm.py``), so the per-token log-ratio
is the **whole-bit** surrogate with uniform add-one smoothing

    w(t) = [floor(log2(cnt_T(t)+1)) - floor(log2(N_T+1))]
         - [floor(log2(cnt_R(t)+1)) - floor(log2(N_R+1))]

(T = target slice, R = whole corpus; every quantity int64), per-doc
``weight_bits`` = Σ tf·w(t) exactly, ``keep`` = weight_bits > 0 ("more
target-like than corpus-average"), ``avg_bits`` = ONE IEEE division.
floor(log2) is exact on both engines (numpy frexp / DuckDB binary
digit count — the ``lm.py`` convention). Reference analog: the
match-score ranking that orders query results by evidence weight
(`strategy/panako/PanakoStrategy.java` score ordering), lifted to the
corpus-selection axis.

Scale shape (the ``lm.py`` playbook): ONE pass computes BOTH
distributions — the per-batch combiner emits (token, cnt_raw_partial,
cnt_tgt_partial) so the target slice never needs a second scan or
exchange; ONE token-hash exchange reduces to exact per-token counts
(in-bucket grouping by the real string); counts pack to sorted arrays
in a task and broadcast; scoring is a stateless ``map_batches`` with a
searchsorted lookup — two linear scans of the corpus total, no
second shuffle, streams at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from raydedup.hashing import hash_strings_u64
from raydedup.stages.lm import _bitlen_minus1

I64 = np.int64

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("weight_bits", pa.int64()),
        ("keep", pa.int64()),
        ("avg_bits", pa.float64()),
    ]
)


def _dual_counts_partial(t: pa.Table, target_col: str, target_value: str) -> pa.Table:
    """One batch -> per-token (cnt_raw_partial, cnt_tgt_partial) plus
    the exchange key. The target indicator is resolved per doc inside
    the batch, so both distributions come out of a single token scan."""
    from raydedup.stages.tfidf import _batch_doc_token_counts, _with_token_key

    schema = pa.schema(
        [
            ("token", pa.large_string()),
            ("cr_partial", pa.int64()),
            ("ct_partial", pa.int64()),
            ("key", pa.int64()),
        ]
    )
    if t.num_rows == 0 or t.num_columns == 0:
        return schema.empty_table()
    c = _batch_doc_token_counts(t)
    if c.num_rows == 0:
        return schema.empty_table()
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    import pyarrow.compute as pc

    is_tgt = pc.equal(
        pc.fill_null(t.column(target_col), ""), target_value
    ).to_numpy(zero_copy_only=False)
    order = np.argsort(ids)
    cd = c.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    tgt_per_row = is_tgt[order[np.searchsorted(ids[order], cd)]]
    tf = c.column("tf").to_numpy(zero_copy_only=False).astype(I64)
    withm = pa.table(
        {
            "token": c.column("token"),
            "cr": pa.array(tf),
            "ct": pa.array(np.where(tgt_per_row, tf, 0).astype(I64)),
        }
    )
    g = withm.group_by("token").aggregate([("cr", "sum"), ("ct", "sum")])
    g = g.rename_columns(["token", "cr_partial", "ct_partial"]).cast(
        pa.schema(
            [("token", pa.large_string()), ("cr_partial", pa.int64()),
             ("ct_partial", pa.int64())]
        )
    )
    return _with_token_key(g)


@ray.remote(num_returns=5)
def _pack_dual(*blocks: pa.Table):
    """(N_raw, N_tgt, sorted token-hash keys, cnt_raw, cnt_tgt) for
    broadcast — the vocabulary never lands on the driver."""
    parts = [b for b in blocks if b.num_rows]
    if not parts:
        z = np.empty(0, dtype=I64)
        return 0, 0, np.empty(0, dtype=np.uint64), z, z
    tbl = pa.concat_tables(parts)
    keys = hash_strings_u64(tbl.column("token").to_numpy(zero_copy_only=False))
    cr = tbl.column("cr").to_numpy(zero_copy_only=False).astype(I64)
    ct = tbl.column("ct").to_numpy(zero_copy_only=False).astype(I64)
    order = np.argsort(keys)
    return int(cr.sum()), int(ct.sum()), keys[order], cr[order], ct[order]


def dsir_weights(
    docs: Dataset,
    *,
    target_col: str = "lang",
    target_value: str = "en",
) -> Dataset:
    """docs(doc_id, text, <target_col>) -> one row per doc:
    (doc_id, n_tokens, weight_bits, keep, avg_bits). Empty docs score
    0 / 0 / keep=0 / 0.0."""
    from raydedup.stages.exchange import hash_exchange_apply

    docs = docs.select_columns(["doc_id", "text", target_col]).materialize()

    partials = docs.map_batches(
        lambda t: _dual_counts_partial(t, target_col, target_value),
        batch_format="pyarrow",
    )

    def reduce_bucket(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("token", pa.large_string()), ("cr", pa.int64()), ("ct", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        g = t.group_by("token").aggregate(
            [("cr_partial", "sum"), ("ct_partial", "sum")]
        )
        return g.rename_columns(["token", "cr", "ct"]).cast(schema)

    refs = hash_exchange_apply(partials, "key", reduce_bucket, collect=False)
    nr_ref, nt_ref, keys_ref, cr_ref, ct_ref = _pack_dual.remote(*refs)

    def score_batch(t: pa.Table) -> pa.Table:
        from raydedup.stages.tfidf import _batch_doc_token_counts

        if t.num_rows == 0 or t.num_columns == 0:
            return _OUT_SCHEMA.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
        c = _batch_doc_token_counts(t)
        n_tok = np.zeros(ids.shape[0], dtype=I64)
        bits = np.zeros(ids.shape[0], dtype=I64)
        if c.num_rows:
            nr = np.int64(int(ray.get(nr_ref)) + 1)
            nt = np.int64(int(ray.get(nt_ref)) + 1)
            keys = ray.get(keys_ref)
            crv = ray.get(cr_ref)
            ctv = ray.get(ct_ref)
            bl_nr = np.int64(int(nr).bit_length() - 1)
            bl_nt = np.int64(int(nt).bit_length() - 1)
            tok = c.column("token").to_numpy(zero_copy_only=False)
            tf = c.column("tf").to_numpy(zero_copy_only=False).astype(I64)
            th = hash_strings_u64(tok)
            pos = np.searchsorted(keys, th)  # every token is in the table
            w = (_bitlen_minus1(ctv[pos] + 1) - bl_nt) - (
                _bitlen_minus1(crv[pos] + 1) - bl_nr
            )
            order = np.argsort(ids)
            cd = c.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
            at = order[np.searchsorted(ids[order], cd)]
            np.add.at(n_tok, at, tf)
            np.add.at(bits, at, tf * w)
        avg = np.where(n_tok > 0, bits / np.maximum(n_tok, 1), 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "weight_bits": pa.array(bits, pa.int64()),
                "keep": pa.array((bits > 0).astype(I64), pa.int64()),
                "avg_bits": pa.array(avg, pa.float64()),
            }
        )

    return docs.map_batches(score_batch, batch_format="pyarrow")
