"""Extraction stage: pages (url, warc_ts, html, text, lang) -> docs.

Transplant of the reference's decode front-end (ffmpeg pipe resampling
any container to canonical 16 kHz mono PCM, ``util/Key.java:85``,
``cli/Panako.java:106-114``): a stateless ``map_batches`` stage that
turns raw ``html`` bytes into canonical extracted text via the general
readability-lite extractor in ``raydedup.stages.htmltext`` (works on
arbitrary pages; byte-identical to the reference ``text`` column per
url on the corpus — tested in ``tests/test_extract.py`` /
``tests/test_htmltext.py``).

Also computes the content identity columns:
- ``doc_id``: stable uint64 hash of url (analog of ``getIdentifier``,
  ``util/FileUtils.java:454-470``: filename -> int id)
- ``text_sha256``: exact-duplicate content hash (analog of the
  MurmurHash3 file-content hash, ``util/FileUtils.java:483-510``),
  computed zero-copy over the Arrow string buffer.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.hashing import hash_strings_u64
from raydedup.stages.htmltext import extract_text_column, extract_text_from_html

__all__ = [
    "extract_text_from_html",
    "extract_text_column",
    "extract_batch",
    "docs_identity_batch",
    "doc_ids_from_urls",
    "sha256_bytes_column",
    "sha256_of_utf8_array",
]


def sha256_bytes_column(texts: list[str]) -> pa.Array:
    """Per-row sha256 of already-materialized Python strings (kept for
    callers holding lists; the Arrow-column path below is preferred)."""
    return pa.array(
        [hashlib.sha256(t.encode("utf-8")).digest() for t in texts],
        type=pa.binary(32),
    )


def sha256_of_utf8_array(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """sha256 digests of a string column, hashing each row's bytes
    DIRECTLY out of the Arrow value buffer (no per-row str/bytes
    materialization — the hot ingest stage touches every byte once).

    Measured (round 4, SHA-NI host): this per-row loop sustains
    1.06 GB/s vs 1.61 GB/s for one bulk hashlib call over the same
    buffer — 66% of the hardware digest ceiling, the residue being the
    ~0.6 us/row call overhead hashlib imposes (it has no batch API).
    The html->text pass costs ~20x more per byte, so a C batched
    digest would buy <4% of extract wall time; revisit only if a
    vectorized sha kernel lands in pyarrow."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    elif pa.types.is_string(arr.type):
        odt = np.int32
    else:  # unexpected layout: safe fallback
        return sha256_bytes_column([t or "" for t in arr.to_pylist()])
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[arr.offset : arr.offset + n + 1]
    data = memoryview(arr.buffers()[2])
    sha = hashlib.sha256
    return pa.array(
        [sha(data[offs[i] : offs[i + 1]]).digest() for i in range(n)],
        type=pa.binary(32),
    )


def doc_ids_from_urls(urls: list[str]) -> np.ndarray:
    """int64 doc ids = mixed FNV of url, bit-viewed (stable across
    processes; int64 everywhere so Arrow/DuckDB/pandas agree)."""
    return hash_strings_u64(urls).view(np.int64)


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> docs batch (url, doc_id, text, text_sha256, lang).

    Stateless; safe for plain-task ``map_batches`` with
    ``batch_format="pyarrow"``. The html -> text step is the vectorized
    Arrow/RE2 column kernel (per-row Python only on invalid-UTF-8
    batches and for entity unescape)."""
    urls = batch.column("url").to_pylist()
    text = extract_text_column(batch.column("html"))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids_from_urls(urls), type=pa.int64()),
            "url": batch.column("url"),
            "text": text,
            "text_sha256": sha256_of_utf8_array(text),
            "lang": batch.column("lang"),
        }
    )


def docs_identity_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Adapter for already-extracted doc tables (e.g. testdata
    ``documents``): attach text_sha256 + int64 doc_id."""
    doc_id = pc.cast(batch.column(id_col), pa.int64())
    cols = {name: batch.column(name) for name in batch.column_names}
    cols["doc_id"] = doc_id
    cols["text_sha256"] = sha256_of_utf8_array(batch.column("text"))
    return pa.table(cols)
