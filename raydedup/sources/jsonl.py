"""JSONL sources: newline-delimited JSON pages/docs -> canonical Datasets.

Web-crawl deliveries commonly arrive as NDJSON (one page object per
line) before anyone converts them to Parquet; the reference's
front-end likewise accepts arbitrary container formats and
canonicalizes at ingest (ffmpeg probe template ``util/Key.java:85``,
``cli/Panako.java:106-114``). These readers adapt NDJSON to the exact
Dataset shapes ``sources/pages.py`` produces, so every downstream
stage is format-agnostic.

``ray.data.read_json`` wraps the Arrow NDJSON reader — block-per-file
streaming. JSON is row-major: there is no column pruning or row-group
skipping at the read (the adapter projects immediately after parse,
which is the best a text format allows). At 100 TB, convert to Parquet
once (``cmd_export`` / ``write_parquet``) and read that; JSONL is the
ingest edge, not the steady-state store.

JSON strings cannot carry raw bytes, so the ``html`` payload arrives
as a UTF-8 string; the adapter bit-casts it to the binary column the
extract stage expects (zero-copy buffer reuse).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

_PAGES_SCHEMA = pa.schema(
    [("url", pa.string()), ("html", pa.binary()), ("lang", pa.string())]
)


def _pages_adapter(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return _PAGES_SCHEMA.empty_table()
    missing = [c for c in ("url", "html") if c not in t.column_names]
    if missing:
        # fail LOUDLY: a docs-shaped or malformed delivery must not
        # silently vanish into empty batches
        raise ValueError(
            f"pages JSONL records lack required key(s) {missing}; "
            f"got columns {t.column_names}"
        )
    if "lang" not in t.column_names:
        # lang is optional in crawl deliveries; normalize to ""
        t = t.append_column("lang", pa.array([""] * t.num_rows, pa.string()))
    html = t.column("html")
    if isinstance(html, pa.ChunkedArray):
        html = html.combine_chunks()
    if pa.types.is_large_string(html.type):
        html = html.cast(pa.large_binary()).cast(pa.binary())
    elif pa.types.is_string(html.type):
        html = html.cast(pa.binary())
    return pa.table(
        {
            "url": pc.cast(t.column("url"), pa.string()),
            "html": html,
            "lang": pc.fill_null(pc.cast(t.column("lang"), pa.string()), ""),
        }
    )


def read_pages_jsonl(path: str | list[str], *, lang: str | None = None) -> Dataset:
    """NDJSON page records {url, html, lang, ...} -> the raw pages
    Dataset shape of ``read_pages`` (url, html:binary, lang)."""
    ds = rd.read_json(path).map_batches(_pages_adapter, batch_format="pyarrow")
    if lang is not None:
        import pyarrow.compute as pc

        ds = ds.map_batches(
            lambda t: t.filter(pc.equal(t["lang"], lang))
            if t.num_rows and "lang" in t.column_names
            else _PAGES_SCHEMA.empty_table(),
            batch_format="pyarrow",
        )
    return ds


def read_docs_jsonl(path: str | list[str]) -> Dataset:
    """NDJSON document records {doc_id, text, ...} -> canonical docs
    Dataset (identity columns attached, same as ``read_docs``)."""
    from raydedup.stages.extract import docs_identity_batch

    return rd.read_json(path).map_batches(
        docs_identity_batch, batch_format="pyarrow"
    )
