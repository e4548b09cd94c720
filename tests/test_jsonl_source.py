"""JSONL source tests: NDJSON pages/docs read to the same canonical
Datasets as the Parquet readers — extraction results byte-identical."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def jsonl_paths(small_corpus, tmp_path_factory):
    """Rewrite the small corpus' pages parquet as NDJSON (html decoded
    to the UTF-8 string JSON can carry)."""
    import glob

    _, paths = small_corpus
    out = tmp_path_factory.mktemp("jsonl")
    pages_files = sorted(glob.glob(os.path.join(paths["pages"], "*.parquet")))
    jl = str(out / "pages.jsonl")
    with open(jl, "w", encoding="utf-8") as f:
        for pf in pages_files:
            t = pq.read_table(pf)
            for row in t.to_pylist():
                f.write(
                    json.dumps(
                        {
                            "url": row["url"],
                            "html": bytes(row["html"]).decode("utf-8"),
                            "lang": row["lang"],
                        }
                    )
                    + "\n"
                )
    return paths, jl


def test_pages_jsonl_matches_parquet(ray_session, jsonl_paths):
    from raydedup.sources.jsonl import read_pages_jsonl
    from raydedup.sources.pages import pages_to_docs, read_pages

    paths, jl = jsonl_paths
    a = (
        pages_to_docs(read_pages_jsonl(jl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        pages_to_docs(read_pages(paths["pages"]))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(a) == len(b) == 600
    assert list(a.columns) == list(b.columns)
    assert a["text"].equals(b["text"])
    assert a["text_sha256"].equals(b["text_sha256"])
    assert a["url"].equals(b["url"])


def test_pages_jsonl_lang_filter(ray_session, jsonl_paths):
    from raydedup.sources.jsonl import read_pages_jsonl

    _, jl = jsonl_paths
    ds = read_pages_jsonl(jl, lang="en")
    langs = set(ds.to_pandas()["lang"])
    assert langs <= {"en"}


def test_docs_jsonl_identity(ray_session, tmp_path):
    from raydedup.sources.jsonl import read_docs_jsonl
    from raydedup.sources.pages import read_docs

    src = "/root/testdata/sf0.001/documents.parquet"
    t = pq.read_table(src)
    jl = str(tmp_path / "docs.jsonl")
    with open(jl, "w", encoding="utf-8") as f:
        for row in t.to_pylist():
            f.write(json.dumps(row) + "\n")
    a = read_docs_jsonl(jl).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = (
        read_docs("/root/testdata/sf0.001")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a["text"].equals(b["text"])
    assert a["text_sha256"].equals(b["text_sha256"])


def test_pages_jsonl_missing_keys(ray_session, tmp_path):
    """A docs-shaped JSONL fed to the pages reader fails loudly;
    a missing optional lang key normalizes to ''."""
    bad = tmp_path / "bad.jsonl"
    bad.write_text(json.dumps({"doc_id": 1, "text": "x"}) + "\n")
    from raydedup.sources.jsonl import read_pages_jsonl

    with pytest.raises(Exception, match="lack required"):
        read_pages_jsonl(str(bad)).count()

    nolang = tmp_path / "nolang.jsonl"
    nolang.write_text(json.dumps({"url": "u1", "html": "<main>hi</main>"}) + "\n")
    df = read_pages_jsonl(str(nolang)).to_pandas()
    assert df["lang"].tolist() == [""]
