"""Extraction stage: pages (url, warc_ts, html, text, lang) -> docs.

Transplant of the reference's decode front-end (ffmpeg pipe resampling
any container to canonical 16 kHz mono PCM, ``util/Key.java:85``,
``cli/Panako.java:106-114``): a stateless ``map_batches`` stage that
turns raw ``html`` bytes into canonical extracted text. The north-star
invariant is that extraction is a pure deterministic function of the
html bytes and reproduces the reference ``text`` column byte-identically
per url (tested in ``tests/test_extract.py``).

Also computes the content identity columns:
- ``doc_id``: stable uint64 hash of url (analog of ``getIdentifier``,
  ``util/FileUtils.java:454-470``: filename -> int id)
- ``text_sha256``: exact-duplicate content hash (analog of the
  MurmurHash3 file-content hash, ``util/FileUtils.java:483-510``).
"""

from __future__ import annotations

import hashlib
import html as _htmllib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raydedup.hashing import U64, hash_strings_u64

# The synthetic corpus renders text into <main>...</main>; extraction is
# the exact inverse (see raydedup.corpus.render_html).
_MAIN_RE = re.compile(rb"<main>(.*?)</main>", re.S)


def extract_text_from_html(html: bytes) -> str:
    """Pure function html bytes -> canonical text (byte-identical inverse
    of the corpus renderer)."""
    m = _MAIN_RE.search(html)
    if m is None:
        return ""
    return _htmllib.unescape(m.group(1).decode("utf-8"))


def sha256_bytes_column(texts: list[str]) -> pa.Array:
    return pa.array(
        [hashlib.sha256(t.encode("utf-8")).digest() for t in texts],
        type=pa.binary(32),
    )


def doc_ids_from_urls(urls: list[str]) -> np.ndarray:
    """int64 doc ids = mixed FNV of url, bit-viewed (stable across
    processes; int64 everywhere so Arrow/DuckDB/pandas agree)."""
    return hash_strings_u64(urls).view(np.int64)


def extract_batch(batch: pa.Table) -> pa.Table:
    """pages batch -> docs batch (url, doc_id, text, text_sha256, lang).

    Stateless; safe for plain-task ``map_batches`` with
    ``batch_format="pyarrow"``.
    """
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    texts = [extract_text_from_html(h) for h in htmls]
    out = pa.table(
        {
            "doc_id": pa.array(doc_ids_from_urls(urls), type=pa.int64()),
            "url": batch.column("url"),
            "text": pa.array(texts, type=pa.string()),
            "text_sha256": sha256_bytes_column(texts),
            "lang": batch.column("lang"),
        }
    )
    return out


def docs_identity_batch(batch: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Adapter for already-extracted doc tables (e.g. testdata
    ``documents``): attach text_sha256 + uint64 doc_id."""
    texts = batch.column("text").to_pylist()
    doc_id = pc.cast(batch.column(id_col), pa.int64())
    cols = {name: batch.column(name) for name in batch.column_names}
    cols["doc_id"] = doc_id
    cols["text_sha256"] = sha256_bytes_column([t or "" for t in texts])
    return pa.table(cols)
