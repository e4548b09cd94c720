"""Arrow IPC (Feather v2) source/sink: columnar-interchange docs <->
Datasets — the fourth interchange edge beside Parquet/JSONL/CSV.

Arrow IPC is what columnar tooling hands between processes (pandas
``to_feather``, polars ``write_ipc``, Arrow Flight payloads); like the
other edges it canonicalizes at ingest (the reference accepts any
container and normalizes up front, ``cli/Panako.java:106-114``):
``read_ipc_docs`` produces the exact canonical docs shape
(``stages/extract.py docs_identity_batch``), so every downstream stage
stays format-agnostic.

Scale shape: one read task per file (IPC files are the parallelism
unit, the ``read_warc_pages`` pattern); the IPC format IS Arrow, so
the decode is a zero-copy buffer cast, not a parse. ``write_ipc_docs``
is the deterministic distributed inverse: one shard per block written
in-task with content-derived names and atomic renames — the
CSV/JSONL sink contract (never row-count-named: equal-sized blocks
would collide and silently drop data)."""

from __future__ import annotations

import glob as _glob
import hashlib
import os

import pyarrow as pa
import pyarrow.ipc as pipc

import ray.data as rd
from ray.data import Dataset


def read_ipc_docs(path_or_paths, *, id_col: str = "doc_id") -> Dataset:
    """Arrow IPC file(s)/dir (``*.arrow`` / ``*.feather``) -> canonical
    docs Dataset (identity columns recomputed from content)."""
    from raydedup.stages.extract import docs_identity_batch

    if isinstance(path_or_paths, (list, tuple)):
        files = [str(p) for p in path_or_paths]
    elif os.path.isdir(path_or_paths):
        files = sorted(
            _glob.glob(os.path.join(path_or_paths, "*.arrow"))
            + _glob.glob(os.path.join(path_or_paths, "*.feather"))
        )
    else:
        files = [path_or_paths]
    if not files:
        raise FileNotFoundError(f"no .arrow / .feather under {path_or_paths!r}")

    def load(batch: pa.Table) -> pa.Table:
        parts = []
        for p in batch.column("path").to_pylist():
            with pa.memory_map(p, "r") as src:
                t = pipc.open_file(src).read_all()
            if t.num_rows and "text" not in t.column_names:
                raise ValueError(
                    f"docs IPC file {p!r} lacks required column 'text'; "
                    f"got {t.column_names}"
                )
            parts.append(docs_identity_batch(t, id_col=id_col))
        return pa.concat_tables(parts) if parts else pa.table({})

    paths = rd.from_arrow(pa.table({"path": pa.array(files, pa.string())}))
    return paths.repartition(len(files)).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )


def write_ipc_docs(
    docs: Dataset,
    out_dir: str,
    *,
    columns: list[str] | None = None,
) -> int:
    """docs Dataset -> one Feather-v2 shard per block under
    ``out_dir``; returns rows written. Distributed, content-named,
    atomic, byte-deterministic for deterministic blocks."""
    os.makedirs(out_dir, exist_ok=True)
    if columns is not None:
        docs = docs.select_columns(columns)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        t = t.combine_chunks()
        if "doc_id" in t.column_names:
            key = int(
                min(t.column("doc_id").to_pylist())
            ) & 0xFFFFFFFFFFFFFFFF
        else:
            digest = hashlib.sha256()
            for col in t.itercolumns():
                for buf in col.combine_chunks().buffers():
                    if buf is not None:
                        digest.update(buf)
            key = int.from_bytes(digest.digest()[:8], "big")
        path = os.path.join(out_dir, f"part-{key:016x}-{t.num_rows}.arrow")
        tmp = path + f".tmp{os.getpid()}"
        with pipc.new_file(tmp, t.schema) as w:
            w.write_table(t)
        os.replace(tmp, path)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    counts = docs.map_batches(write_block, batch_format="pyarrow").to_pandas()
    return int(counts["rows"].sum()) if len(counts) else 0
