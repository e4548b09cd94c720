"""Intra-document repetition removal: dedup repeated lines WITHIN a doc.

Web pages repeat their own navigation, list items, and template rows;
LLM curation pipelines strip within-page repeats before the cross-doc
passes (the within-item sibling of the cross-doc line pass in
``stages/lines.py``; reference analog: the per-item event dedup inside
one fingerprint extraction, ``strategy/panako/PanakoStrategy.java``'s
per-file fingerprint set semantics — duplicate events inside one item
are collapsed before indexing).

Scale shape: ROW-LOCAL — one stateless ``map_batches``, zero shuffle,
streams at 100 TB by construction. The per-batch kernel is fully
vectorized: one Arrow ``split_pattern``, one Arrow C++ ``group_by`` over
``(doc index, line string)`` (exact string grouping — hash collisions
cannot merge distinct lines), one boolean gather, one ``binary_join``
to reassemble the text. No per-row Python.

Semantics: lines = byte-exact split on ``\\n``; the FIRST occurrence of
each distinct line within a doc is kept in original order, later
occurrences are dropped. Empty lines are deduped like any other line
(the second blank line of a doc duplicates the first) — callers that
want structure-preserving blank handling run the cross-doc pass
instead. Null text == "" (one empty line, kept).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64

_OUT_FIELDS = [
    ("text", pa.large_string()),
    ("n_lines", pa.int64()),
    ("n_dup_lines", pa.int64()),
]


def dedup_lines_within(t: pa.Table, text_col: str = "text") -> pa.Table:
    """One batch: replace ``text_col`` with its within-doc line-deduped
    text and append ``n_lines`` / ``n_dup_lines`` counters."""
    import pyarrow.compute as pc

    from raydedup.stages.lines import _batch_line_arrays

    n = t.num_rows
    passthrough = {
        name: t.column(name) for name in t.column_names if name not in
        {text_col, "n_lines", "n_dup_lines"}
    }
    if n == 0:
        cols = dict(passthrough)
        for fname, ftype in _OUT_FIELDS:
            cols[fname] = pa.array([], ftype)
        return pa.table(cols)

    vals, doc_of, lens = _batch_line_arrays(t.select([text_col]).rename_columns(["text"]))
    # exact first-occurrence per (doc, line string): Arrow C++ hash
    # group-by on the REAL strings — collisions affect nothing
    idx = np.arange(len(vals), dtype=I64)
    firsts = (
        pa.table({"g": pa.array(doc_of), "line": vals, "i": pa.array(idx)})
        .group_by(["g", "line"], use_threads=False)
        .aggregate([("i", "min")])
    )
    keep_idx = np.sort(firsts.column("i_min").to_numpy(zero_copy_only=False))
    kept_vals = vals.take(pa.array(keep_idx))
    new_lens = np.bincount(doc_of[keep_idx], minlength=n).astype(I64)
    new_offs = np.zeros(n + 1, dtype=I64)
    np.cumsum(new_lens, out=new_offs[1:])
    if isinstance(kept_vals, pa.ChunkedArray):
        kept_vals = kept_vals.combine_chunks()
    lst = pa.LargeListArray.from_arrays(pa.array(new_offs, pa.int64()), kept_vals)
    # binary_join requires the separator type to equal the item type
    joined = pc.binary_join(lst, pa.scalar("\n", kept_vals.type)).cast(
        pa.large_string()
    )

    cols = dict(passthrough)
    cols["text"] = joined
    cols["n_lines"] = pa.array(lens, pa.int64())
    cols["n_dup_lines"] = pa.array(lens - new_lens, pa.int64())
    return pa.table(cols)


def para_dedup(docs: Dataset, text_col: str = "text") -> Dataset:
    """docs -> docs with within-doc repeated lines removed (first
    occurrence kept, original order) plus per-doc counters
    ``n_lines`` / ``n_dup_lines``. Row-local; streams."""
    return docs.map_batches(
        lambda t: dedup_lines_within(t, text_col), batch_format="pyarrow"
    )
