"""Keyword search over the corpus (the ``panako query``-by-content verb
on the token axis: find every document containing a given term set).

Stateless single-pass ``map_batches`` — the query terms are a tiny
driver-side constant closed over by the UDF (broadcast-by-closure; no
shuffle, no index required). For repeated interactive querying the
store/query pipeline's persistent index is the right tool; this is the
one-shot distributed grep.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64

_OUT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("n_matched", pa.int64()), ("n_hits", pa.int64())]
)


def search_terms(docs: Dataset, terms: list[str], mode: str = "and") -> Dataset:
    """docs(doc_id, text) -> (doc_id, n_matched, n_hits) for docs whose
    lowered whitespace tokens cover the query.

    ``n_matched`` = distinct query terms present, ``n_hits`` = total
    occurrences of query terms. ``mode="and"`` keeps docs matching ALL
    terms; ``"or"`` keeps docs matching any.
    """
    if mode not in ("and", "or"):
        raise ValueError(f"unknown search mode: {mode!r}")
    tset = sorted({t.lower() for t in terms})
    if not tset:
        raise ValueError("search_terms needs at least one term")
    need = len(tset) if mode == "and" else 1

    from raydedup.stages.tfidf import _batch_doc_token_counts

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = _batch_doc_token_counts(t)
        if c.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        hit = c.filter(pc.is_in(c.column("token"), value_set=pa.array(tset)))
        if hit.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        g = hit.group_by("doc_id").aggregate([([], "count_all"), ("tf", "sum")])
        g = g.rename_columns(["doc_id", "n_matched", "n_hits"]).cast(_OUT_SCHEMA)
        return g.filter(pc.greater_equal(g.column("n_matched"), need))

    return docs.select_columns(["doc_id", "text"]).map_batches(
        kernel, batch_format="pyarrow"
    )
