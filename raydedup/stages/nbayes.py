"""Multinomial Naive Bayes document classifier in EXACT whole-bit
arithmetic — model TRAINING as a data pipeline, not a library call.

The classic fastText/NB quality-and-domain classifier pass of a web
curation stack (CCNet trains a linear classifier to route documents;
the reference's analog is the per-strategy match scorer that ranks
candidates by accumulated evidence, `strategy/panako/PanakoStrategy.java`)
expressed over the engine's primitives: a deterministic modulo
train/test split, per-(class, token) counts via ONE token-hash
exchange, and a stateless broadcast scoring pass.

``ln`` of arbitrary doubles is banned by the oracle-parity rule
(``stages/lm.py``), so log-probabilities are the **whole-bit**
surrogates (floor(log2), exact on both engines):

    prior(c)   = bl(n_docs_c + 1) - bl(n_docs_train + 1)
    lw_c(t)    = bl(cnt_c(t) + 1) - bl(N_c + 1)        (add-one smoothed)
    score_c(d) = prior(c) + sum_t tf_{d,t} * lw_c(t)   (exact int64)

predicted = argmax_c score_c(d), ties broken by the SMALLEST class
string (numpy first-max over an ascending class axis == SQL
``ORDER BY score DESC, class ASC``). Whole-bit rounding costs <= 1 bit
per factor vs true log2 — a monotone surrogate, same trade recorded
for surprisal and DSIR.

Scale shape: training counts ride the ``lm.py`` playbook (per-batch
combiner -> ONE token exchange -> pack-in-a-task -> broadcast); the
model broadcast is a dense (vocab x classes) int64 count matrix plus
sorted token-hash keys — right for the few-dozen-class regime this
targets (language/domain/quality routing). At web-scale vocabularies
hash the tokens into 2^k buckets first (the DSIR trick) to bound the
matrix; the class axis is the small side by construction.
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
        ("actual", pa.large_string()),
        ("predicted", pa.large_string()),
        ("score_bits", pa.int64()),
        ("correct", pa.int64()),
    ]
)


def _train_counts_partial(t: pa.Table, class_col: str, test_mod: int) -> pa.Table:
    """One batch -> per-(class, token) training-count partials (train
    rows only) + the token exchange key (the shared ``_with_token_key``
    convention, so partials co-locate with every other token stage)."""
    from raydedup.stages.tfidf import _batch_doc_token_counts, _with_token_key

    schema = pa.schema(
        [("cls", pa.large_string()), ("token", pa.large_string()),
         ("cnt_partial", pa.int64()), ("key", pa.int64())]
    )
    if t.num_rows == 0 or t.num_columns == 0:
        return schema.empty_table()
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    train_mask = (ids % test_mod) != 0
    if not train_mask.any():
        return schema.empty_table()
    sub = t.filter(pa.array(train_mask))
    c = _batch_doc_token_counts(sub)
    if c.num_rows == 0:
        return schema.empty_table()
    import pyarrow.compute as pc

    sids = sub.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    cls = pc.fill_null(sub.column(class_col), "").cast(pa.large_string())
    order = np.argsort(sids)
    cd = c.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    row_cls = cls.take(pa.array(order[np.searchsorted(sids[order], cd)]))
    withc = pa.table(
        {"cls": row_cls, "token": c.column("token"), "tf": c.column("tf")}
    )
    g = withc.group_by(["cls", "token"]).aggregate([("tf", "sum")])
    g = g.rename_columns(["cls", "token", "cnt_partial"]).cast(
        pa.schema(
            [("cls", pa.large_string()), ("token", pa.large_string()),
             ("cnt_partial", pa.int64())]
        )
    )
    return _with_token_key(g)


def _class_doc_counts(docs: Dataset, class_col: str, test_mod: int) -> dict[str, int]:
    """Per-class TRAIN doc counts — a tiny combiner aggregate (classes
    are the small axis; this is the only driver-side state)."""

    def partial(t: pa.Table) -> pa.Table:
        schema = pa.schema([("cls", pa.large_string()), ("nd", pa.int64())])
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
        sub = t.filter(pa.array((ids % test_mod) != 0))
        if sub.num_rows == 0:
            return schema.empty_table()
        import pyarrow.compute as pc

        g = pa.table(
            {"cls": pc.fill_null(sub.column(class_col), "").cast(pa.large_string())}
        ).group_by("cls").aggregate([([], "count_all")])
        return g.rename_columns(["cls", "nd"]).cast(schema)

    out: dict[str, int] = {}
    for part in docs.map_batches(partial, batch_format="pyarrow").to_pandas().itertuples():
        out[part.cls] = out.get(part.cls, 0) + int(part.nd)
    return out


@ray.remote(num_returns=2)
def _pack_model(classes: tuple, *blocks: pa.Table):
    """(sorted token-hash keys, dense (V, C) count matrix) from the
    exchanged (class, token, cnt) blocks — built in a task, broadcast
    by ref; the vocabulary never lands on the driver."""
    cidx = {c: i for i, c in enumerate(classes)}
    parts = [b for b in blocks if b.num_rows]
    if not parts:
        return np.empty(0, dtype=np.uint64), np.zeros((0, len(classes)), dtype=I64)
    tbl = pa.concat_tables(parts)
    keys = hash_strings_u64(tbl.column("token").to_numpy(zero_copy_only=False))
    cls = tbl.column("cls").to_numpy(zero_copy_only=False)
    cnt = tbl.column("cnt").to_numpy(zero_copy_only=False).astype(I64)
    uk = np.unique(keys)
    mat = np.zeros((uk.shape[0], len(classes)), dtype=I64)
    rows = np.searchsorted(uk, keys)
    cols = np.fromiter((cidx[c] for c in cls), dtype=I64, count=cls.shape[0])
    np.add.at(mat, (rows, cols), cnt)
    return uk, mat


def nb_classify(
    docs: Dataset,
    *,
    class_col: str = "source",
    test_mod: int = 5,
) -> Dataset:
    """Train multinomial NB on docs with doc_id % test_mod != 0, score
    the held-out docs (doc_id % test_mod == 0). One row per test doc:
    (doc_id, actual, predicted, score_bits, correct)."""
    from raydedup.stages.exchange import hash_exchange_apply

    docs = docs.select_columns(["doc_id", "text", class_col]).materialize()

    partials = docs.map_batches(
        lambda t: _train_counts_partial(t, class_col, test_mod),
        batch_format="pyarrow",
    )

    def reduce_bucket(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("cls", pa.large_string()), ("token", pa.large_string()),
             ("cnt", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        g = t.group_by(["cls", "token"]).aggregate([("cnt_partial", "sum")])
        return g.rename_columns(["cls", "token", "cnt"]).cast(schema)

    refs = hash_exchange_apply(partials, "key", reduce_bucket, collect=False)

    doc_counts = _class_doc_counts(docs, class_col, test_mod)
    classes = tuple(sorted(doc_counts))  # ascending: argmax tie -> min name
    n_train = sum(doc_counts.values())
    priors = np.array(
        [
            _bitlen_minus1(np.array([doc_counts[c] + 1]))[0]
            - _bitlen_minus1(np.array([n_train + 1]))[0]
            for c in classes
        ],
        dtype=I64,
    )
    keys_ref, mat_ref = _pack_model.remote(classes, *refs)

    def score_batch(t: pa.Table) -> pa.Table:
        from raydedup.stages.tfidf import _batch_doc_token_counts

        if t.num_rows == 0 or t.num_columns == 0:
            return _OUT_SCHEMA.empty_table()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
        test_mask = (ids % test_mod) == 0
        if not test_mask.any():
            return _OUT_SCHEMA.empty_table()
        sub = t.filter(pa.array(test_mask))
        sids = sub.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
        import pyarrow.compute as pc

        actual = pc.fill_null(sub.column(class_col), "").cast(pa.large_string())
        C = len(classes)
        scores = np.tile(priors, (sids.shape[0], 1))
        c = _batch_doc_token_counts(sub)
        if c.num_rows and C:
            keys = ray.get(keys_ref)
            mat = ray.get(mat_ref)
            ncls = mat.sum(axis=0)  # N_c: token total per class
            bl_ncls = _bitlen_minus1(ncls + 1)
            tok = c.column("token").to_numpy(zero_copy_only=False)
            tf = c.column("tf").to_numpy(zero_copy_only=False).astype(I64)
            th = hash_strings_u64(tok)
            cnts = np.zeros((th.shape[0], C), dtype=I64)
            if keys.shape[0]:
                # unknown test-only tokens: cnt 0 in every class
                pos = np.minimum(np.searchsorted(keys, th), keys.shape[0] - 1)
                known = keys[pos] == th
                if known.any():
                    cnts[known] = mat[pos[known]]
            lw = _bitlen_minus1(cnts + 1) - bl_ncls[None, :]
            order = np.argsort(sids)
            cd = c.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
            at = order[np.searchsorted(sids[order], cd)]
            np.add.at(scores, at, tf[:, None] * lw)
        if C:
            best = scores.argmax(axis=1)  # first max == smallest class name
            pred = pa.array([classes[i] for i in best], pa.large_string())
            sbits = scores[np.arange(sids.shape[0]), best]
        else:  # no training docs at all
            pred = pa.array([""] * sids.shape[0], pa.large_string())
            sbits = np.zeros(sids.shape[0], dtype=I64)
        correct = (
            np.asarray(actual.to_pandas()) == np.asarray(pred.to_pandas())
        ).astype(I64)
        return pa.table(
            {
                "doc_id": pa.array(sids, pa.int64()),
                "actual": actual,
                "predicted": pred,
                "score_bits": pa.array(sbits.astype(I64), pa.int64()),
                "correct": pa.array(correct, pa.int64()),
            }
        )

    return docs.map_batches(score_batch, batch_format="pyarrow")
