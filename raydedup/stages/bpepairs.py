"""BPE merge-pair statistics: adjacent-character pair counts.

The statistic a BPE tokenizer trainer computes every merge iteration
(Sennrich et al. 2016): corpus-wide counts of adjacent symbol pairs,
here at the character level — the first iteration's exact input. The
training-data curation run reads the same table to pick merge rules or
to audit a tokenizer against a new corpus slice.

Scale shape (the collocations playbook turned onto the char axis):

1. per-batch combiner: ONE decode pass turns the whole batch's text
   column into a uint32 codepoint array (a single C-level join+encode,
   no per-row Python); adjacent positions where neither side is a
   break character (whitespace / NUL / the row separator) become u64
   pair keys ``left<<32|right``; ``np.unique`` collapses the batch to
   partial counts.
2. ONE exchange keyed on the pair key sums partials. Distinct-pair
   cardinality is bounded by the square of the observed alphabet —
   thousands for real text, safely driver-small even at 10^12 docs
   (the same O(vocab) head assumption as df_commonness, and the reason
   no string ever enters the exchange).
3. the driver filters ``cnt >= min_count``, applies the deterministic
   total order (cnt DESC, left ASC, right ASC), cuts top-k and decodes
   the winners' codepoints back to 1-char strings.

Oracle mirror: DuckDB lateral ``generate_series`` over char positions
with ``substring`` — char semantics match codepoints, and UTF-8 binary
string order equals codepoint order, so the tie-break sort agrees.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

U64 = np.uint64
I64 = np.int64

# break characters: pairs never span these (token-internal adjacency
# only). Explicit ASCII set — mirrored literally in the SQL oracle —
# plus NUL, which doubles as the batch row separator.
_BREAK_CODES = np.array([0x00, 0x09, 0x0A, 0x0D, 0x20], dtype=np.uint32)

_PARTIAL_SCHEMA = pa.schema([("pk", pa.int64()), ("cnt", pa.int64())])
_OUT_SCHEMA = pa.schema(
    [("left", pa.large_string()), ("right", pa.large_string()), ("cnt", pa.int64())]
)


def _batch_pair_partial(t: pa.Table, text_col: str = "text") -> pa.Table:
    """batch -> partial (pk, cnt) counts of adjacent non-break char pairs."""
    col = t.column(text_col)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    if len(arr) == 0:
        return _PARTIAL_SCHEMA.empty_table()
    # one C-level pass: rows joined on NUL (a break char, so no pair
    # ever spans a row boundary), then one utf-32 encode -> codepoints
    joined = "\x00".join(arr.to_pylist())
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    if codes.shape[0] < 2:
        return _PARTIAL_SCHEMA.empty_table()
    ok = ~np.isin(codes, _BREAK_CODES)
    valid = ok[:-1] & ok[1:]
    if not valid.any():
        return _PARTIAL_SCHEMA.empty_table()
    pk = (codes[:-1][valid].astype(U64) << U64(32)) | codes[1:][valid].astype(U64)
    u, c = np.unique(pk, return_counts=True)
    return pa.table(
        {
            "pk": pa.array(u.view(I64), pa.int64()),
            "cnt": pa.array(c.astype(I64), pa.int64()),
        }
    )


def bpe_pair_counts(
    docs: Dataset,
    *,
    min_count: int = 1,
    top_k: int = 50,
    text_col: str = "text",
) -> pa.Table:
    """docs(text) -> top-``top_k`` (left, right, cnt) adjacent-char pairs
    with ``cnt >= min_count``, ordered by (cnt DESC, left ASC, right ASC).
    """
    from raydedup.stages.exchange import hash_exchange_apply

    partials = docs.select_columns([text_col]).map_batches(
        lambda t: _batch_pair_partial(t, text_col), batch_format="pyarrow"
    )

    def reduce_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PARTIAL_SCHEMA.empty_table()
        g = t.group_by("pk").aggregate([("cnt", "sum")])
        g = g.rename_columns(["pk", "cnt"]).cast(_PARTIAL_SCHEMA)
        return g.filter(pc.greater_equal(g.column("cnt"), min_count))

    agg = hash_exchange_apply(partials, "pk", reduce_pairs)
    if agg.num_rows == 0:
        return _OUT_SCHEMA.empty_table()

    pk = agg.column("pk").to_numpy(zero_copy_only=False).view(U64)
    cnt = agg.column("cnt").to_numpy(zero_copy_only=False)
    # total order: cnt DESC, then (left, right) ASC == pk ASC (codepoint
    # order == UTF-8 binary order, so the SQL mirror's string sort agrees)
    order = np.lexsort((pk, -cnt))[:top_k]
    pk, cnt = pk[order], cnt[order]
    left = [chr(int(k >> U64(32))) for k in pk]
    right = [chr(int(k & U64(0xFFFFFFFF))) for k in pk]
    return pa.table(
        {
            "left": pa.array(left, pa.large_string()),
            "right": pa.array(right, pa.large_string()),
            "cnt": pa.array(cnt.astype(I64), pa.int64()),
        }
    )
