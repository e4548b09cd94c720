"""Document chunking: split docs into fixed-size token windows.

The training-data packing step every LLM pipeline runs between curation
and tokenization: each document becomes ceil(n_tokens / chunk) chunks
of at most ``chunk_tokens`` whitespace tokens (optionally overlapping).
Chunk text is the tokens re-joined with single spaces — whitespace
NORMALIZED, which is also what makes the DuckDB oracle exact
(``string_agg(w, ' ' ORDER BY rn)`` per chunk group).

Fully vectorized, zero Python loops in the ASCII path: the batch's
tokens live in ONE flat Arrow array; chunk boundaries are computed as
offset arithmetic over the per-doc token offsets, a ListArray is
rebuilt from (chunk_offsets, flat_tokens), and ``pc.binary_join``
emits every chunk string in a single kernel call. Non-ASCII docs take
the per-doc Python path (same routing as every text stage here).

Stateless ``map_batches`` — chunking is row-local, so the stage
streams with no shuffle at any corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

I64 = np.int64

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("chunk_id", pa.int64()),
        ("text_chunk", pa.large_string()),
        ("n_tokens", pa.int64()),
    ]
)


def _chunk_batch(t: pa.Table, chunk: int, step: int) -> pa.Table:
    import pyarrow.compute as pc

    if t.num_rows == 0 or t.num_columns == 0:
        return _OUT_SCHEMA.empty_table()
    col = t.column("text")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)

    out_ids: list[np.ndarray] = []
    out_cid: list[np.ndarray] = []
    out_txt: list[pa.Array] = []
    out_ntok: list[np.ndarray] = []

    ascii_mask = pc.string_is_ascii(arr).to_numpy(zero_copy_only=False)
    if ascii_mask.any():
        sub = arr.filter(pa.array(ascii_mask))
        toks = pc.utf8_split_whitespace(sub)
        offs = toks.offsets.to_numpy().astype(I64)
        vals = toks.values
        if offs[0] != 0 or len(vals) != offs[-1] - offs[0]:
            vals = vals.slice(offs[0], offs[-1] - offs[0])
            offs = offs - offs[0]
        keep = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        cum = np.zeros(keep.shape[0] + 1, dtype=I64)
        np.cumsum(keep, out=cum[1:])
        tok_offs = cum[offs]  # per-doc offsets into the FILTERED flat tokens
        flat = vals.filter(pa.array(keep))

        n_tok = np.diff(tok_offs)
        # overlapping windows: starts every `step` while start < n_tok
        n_chunks = np.where(n_tok == 0, 0, (np.maximum(n_tok - 1, 0) // step) + 1)
        doc_of = np.repeat(np.arange(n_tok.shape[0], dtype=I64), n_chunks)
        local = (
            np.arange(int(n_chunks.sum()), dtype=I64)
            - np.repeat(np.concatenate([[0], np.cumsum(n_chunks)[:-1]]), n_chunks)
        )
        starts = tok_offs[:-1][doc_of] + local * step
        if starts.shape[0]:
            stops = np.minimum(starts + chunk, tok_offs[1:][doc_of])
            lens = stops - starts
            # gather every chunk's tokens in one vectorized take (windows
            # may overlap, so offsets into `flat` are not monotone —
            # take, don't slice)
            total = int(lens.sum())
            chunk_of = np.repeat(np.arange(starts.shape[0], dtype=I64), lens)
            within = np.arange(total, dtype=I64) - np.repeat(
                np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
            )
            take_idx = starts[chunk_of] + within
            new_offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
            gathered = flat.take(pa.array(take_idx))
            chunks_list = pa.LargeListArray.from_arrays(
                pa.array(new_offs, pa.int64()), gathered.cast(pa.large_string())
            )
            joined = pc.binary_join(chunks_list, pa.scalar(" ", pa.large_string()))
            out_ids.append(ids[ascii_mask][doc_of])
            out_cid.append(local)
            out_txt.append(joined)
            out_ntok.append(lens)

    slow = np.flatnonzero(~ascii_mask)
    if slow.shape[0]:
        texts = arr.to_pylist()
        s_ids: list[int] = []
        s_cid: list[int] = []
        s_txt: list[str] = []
        s_n: list[int] = []
        for d in slow:
            words = texts[d].split()
            j = 0
            start = 0
            while start < len(words):
                part = words[start : start + chunk]
                s_ids.append(int(ids[d]))
                s_cid.append(j)
                s_txt.append(" ".join(part))
                s_n.append(len(part))
                j += 1
                start += step
        out_ids.append(np.asarray(s_ids, dtype=I64))
        out_cid.append(np.asarray(s_cid, dtype=I64))
        out_txt.append(pa.array(s_txt, pa.large_string()))
        out_ntok.append(np.asarray(s_n, dtype=I64))

    if not out_ids:
        return _OUT_SCHEMA.empty_table()
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_ids), pa.int64()),
            "chunk_id": pa.array(np.concatenate(out_cid), pa.int64()),
            "text_chunk": pa.concat_arrays(
                [a.cast(pa.large_string()) for a in out_txt]
            ),
            "n_tokens": pa.array(np.concatenate(out_ntok), pa.int64()),
        }
    )


def chunk_documents(
    docs: Dataset, chunk_tokens: int = 128, overlap: int = 0
) -> Dataset:
    """docs(doc_id, text) -> (doc_id, chunk_id, text_chunk, n_tokens):
    whitespace-normalized token windows of ``chunk_tokens`` tokens,
    starting every ``chunk_tokens - overlap`` tokens. Empty docs yield
    no chunks. Row-local — streams with no shuffle."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    step = chunk_tokens - overlap
    return docs.select_columns(["doc_id", "text"]).map_batches(
        lambda t: _chunk_batch(t, chunk_tokens, step), batch_format="pyarrow"
    )
