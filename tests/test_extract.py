"""Extraction invariant tests: extract(html) == text byte-identically per
url (the north-star per-row invariant; decode-canonicalization analog of
the ffmpeg front-end, ``util/Key.java:85``)."""

import numpy as np
import pyarrow as pa

from raydedup.corpus import CorpusSpec, build_corpus, render_html
from raydedup.stages.extract import (
    doc_ids_from_urls,
    extract_batch,
    extract_text_from_html,
)


def test_render_extract_inverse_simple():
    # extraction inverts the renderer for whitespace-canonical text
    for text in ["hello world", "", "a & b < c > d", "unicode é ü ☃", "x\ny z"]:
        assert extract_text_from_html(render_html("u", text)) == text
    # non-canonical whitespace canonicalizes (tab -> space), like any
    # readability extractor; corpus text is always canonical
    assert extract_text_from_html(render_html("u", "x\ny\tz")) == "x\ny z"


def test_extract_batch_invariant_on_corpus():
    tables = build_corpus(CorpusSpec(n_docs=120, seed=42))
    pages = tables["pages"]
    docs = extract_batch(pages)
    assert docs.column("text").to_pylist() == pages.column("text").to_pylist()


def test_doc_ids_stable_and_unique():
    tables = build_corpus(CorpusSpec(n_docs=300, seed=42))
    urls = tables["pages"].column("url").to_pylist()
    ids = doc_ids_from_urls(urls)
    assert ids.dtype == np.int64
    assert len(set(ids.tolist())) == len(urls)
    np.testing.assert_array_equal(ids, doc_ids_from_urls(urls))


def test_sha256_column():
    pages = build_corpus(CorpusSpec(n_docs=50, seed=1))["pages"]
    docs = extract_batch(pages)
    import hashlib

    texts = docs.column("text").to_pylist()
    shas = docs.column("text_sha256").to_pylist()
    for t, s in zip(texts[:10], shas[:10]):
        assert hashlib.sha256(t.encode()).digest() == s
