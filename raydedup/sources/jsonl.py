"""JSONL source/sink: the interchange format of training-data pipelines.

Completes the source-format surface next to parquet (``pages.py``) and
WARC (``warc.py``): one JSON object per line, optionally gzipped —
what tokenizer/training tooling overwhelmingly consumes and produces.
Reading rides Ray Data's native ``read_json`` (Arrow's C++ JSON
parser, newline-delimited mode) and canonicalizes into the docs
schema via ``docs_identity_batch`` (attaching ``doc_id`` and
``text_sha256``), so every downstream pipeline runs unchanged.
Writing is the deterministic inverse: sorted-key JSON, ``\\n``
terminators, one file per input block — a byte-stable layout a
diff-based data audit can trust.
"""

from __future__ import annotations

import glob as _glob
import gzip
import json
import os

import pyarrow as pa

from ray.data import Dataset

from raydedup.stages.extract import docs_identity_batch


def read_jsonl_docs(path_or_paths, *, id_col: str = "doc_id") -> Dataset:
    """JSONL file(s)/dir (.jsonl / .jsonl.gz) -> canonical docs Dataset.

    Rows must carry ``text`` and an id column (default ``doc_id``);
    every other field passes through as a column. ``doc_id`` is cast
    to int64 and ``text_sha256`` attached — the same identity contract
    as ``read_docs``."""
    import ray.data as rd

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
    # Arrow's JSON reader handles gzip transparently via Ray's
    # file-based datasource (extension-inferred compression)
    ds = rd.read_json(files)
    return ds.map_batches(
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
        key = min(r["doc_id"] for r in rows) if "doc_id" in t.column_names else hash(buf[0])
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
