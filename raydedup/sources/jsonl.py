"""JSONL sources/sink: newline-delimited JSON pages/docs <-> Datasets.

Web-crawl deliveries commonly arrive as NDJSON (one page object per
line) before anyone converts them to Parquet; the reference's
front-end likewise accepts arbitrary container formats and
canonicalizes at ingest (ffmpeg probe template ``util/Key.java:85``,
``cli/Panako.java:106-114``). These readers adapt NDJSON to the exact
Dataset shapes ``sources/pages.py`` produces, so every downstream
stage is format-agnostic; ``write_jsonl_docs`` is the deterministic
distributed inverse (what tokenizer/training tooling consumes).

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

import glob as _glob
import gzip
import json
import os

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


def read_jsonl_docs(path_or_paths, *, id_col: str = "doc_id") -> Dataset:
    """Directory/glob-aware variant of ``read_docs_jsonl``: accepts a
    dir of ``*.jsonl`` / ``*.jsonl.gz`` shards (gzip decoded
    transparently by the Arrow reader), a single file, or an explicit
    list; ``id_col`` names the identity column to canonicalize."""
    from raydedup.stages.extract import docs_identity_batch

    if isinstance(path_or_paths, (list, tuple)):
        files = [str(p) for p in path_or_paths]
    elif os.path.isdir(path_or_paths):
        files = sorted(
            _glob.glob(os.path.join(path_or_paths, "*.jsonl"))
            + _glob.glob(os.path.join(path_or_paths, "*.jsonl.gz"))
        )
    else:
        files = [path_or_paths]
    if not files:
        raise FileNotFoundError(f"no .jsonl / .jsonl.gz under {path_or_paths!r}")
    return rd.read_json(files).map_batches(
        lambda t: docs_identity_batch(t, id_col=id_col), batch_format="pyarrow"
    )


def write_jsonl_docs(
    docs: Dataset,
    out_dir: str,
    *,
    columns: list[str] | None = None,
    gzip_output: bool = False,
) -> int:
    """docs Dataset -> one JSONL shard per block under ``out_dir``;
    returns rows written. The write runs DISTRIBUTED (a map_batches
    stage writes each block inside its task — no driver-side row
    loop); shard names derive from block CONTENT (min doc id + row
    count), so deterministic input blocks produce byte-identical,
    stably-named files: sorted keys, compact separators, ``\\n`` line
    ends, gzip (when on) with pinned mtime, atomic tmp+rename per
    file. Binary columns (e.g. text_sha256) are hex-encoded."""
    os.makedirs(out_dir, exist_ok=True)
    if columns is not None:
        docs = docs.select_columns(columns)
    ext = ".jsonl.gz" if gzip_output else ".jsonl"

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        rows = t.to_pylist()
        buf = []
        for r in rows:
            for k, v in r.items():
                if isinstance(v, bytes):
                    r[k] = v.hex()
            buf.append(json.dumps(r, sort_keys=True, separators=(",", ":")))
        data = ("\n".join(buf) + "\n").encode("utf-8")
        if gzip_output:
            data = gzip.compress(data, 6, mtime=0)
        # content-derived fallback (NOT builtins.hash: PYTHONHASHSEED
        # makes str hash per-process random -> non-deterministic names,
        # and equal first lines would collide; review finding)
        if "doc_id" in t.column_names:
            key = min(r["doc_id"] for r in rows)
        else:
            import hashlib

            key = int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
        path = os.path.join(
            out_dir, f"part-{int(key) & 0xFFFFFFFFFFFFFFFF:016x}-{len(rows)}{ext}"
        )
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.table({"rows": pa.array([len(rows)], pa.int64())})

    counts = docs.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return int(counts["rows"].sum()) if len(counts) else 0
