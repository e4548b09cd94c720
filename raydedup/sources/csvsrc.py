"""CSV source/sink: delimited-text docs <-> Datasets.

CSV is the metadata/annotation interchange of curation tooling (label
exports, URL lists, quality-score dumps) the way JSONL is the document
interchange; the reference's ingest likewise canonicalizes whatever
container arrives (``cli/Panako.java:106-114``). The reader adapts CSV
to the exact canonical docs shape (``stages/extract.py
docs_identity_batch``, same as the Parquet/JSONL/WARC paths) so every
downstream stage stays format-agnostic. Page payloads (raw HTML) do
not belong in CSV — use WARC or JSONL for those edges; this is the
docs/metadata edge.

``ray.data.read_csv`` wraps the Arrow CSV reader — block-per-file
streaming with type inference. CSV is row-major and typeless: no
column pruning, no row-group skipping, and integers wider than 2^53
survive only because the identity columns are recomputed from content
after the parse. At 100 TB convert to Parquet once and read that; CSV
is an ingest/export edge, not the steady-state store.

``write_csv_docs`` is the deterministic distributed inverse: one shard
per block written inside its task (no driver row loop), content-derived
shard names, RFC-4180 minimal quoting with ``\\n`` line ends, binary
columns hex-encoded, atomic tmp+rename — byte-identical output for
deterministic input blocks (pytest-pinned).
"""

from __future__ import annotations

import csv
import glob as _glob
import gzip
import io
import os

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset


def read_csv_docs(path_or_paths, *, id_col: str = "doc_id") -> Dataset:
    """CSV document records (header row with at least ``text``) ->
    canonical docs Dataset (identity columns recomputed from content,
    same as ``read_docs``). Accepts a directory of ``*.csv`` /
    ``*.csv.gz`` shards, a single file, or an explicit list."""
    from raydedup.stages.extract import docs_identity_batch

    if isinstance(path_or_paths, (list, tuple)):
        files = [str(p) for p in path_or_paths]
    elif os.path.isdir(path_or_paths):
        files = sorted(
            _glob.glob(os.path.join(path_or_paths, "*.csv"))
            + _glob.glob(os.path.join(path_or_paths, "*.csv.gz"))
        )
    else:
        files = [path_or_paths]
    if not files:
        raise FileNotFoundError(f"no .csv / .csv.gz under {path_or_paths!r}")

    def adapt(t: pa.Table) -> pa.Table:
        if t.num_rows and "text" not in t.column_names:
            # fail LOUDLY: a malformed delivery must not silently
            # vanish into empty batches (the JSONL reader's contract)
            raise ValueError(
                f"docs CSV lacks required column 'text'; got {t.column_names}"
            )
        if t.num_rows and "text" in t.column_names:
            col = t.column("text")
            if not pa.types.is_string(col.type) and not pa.types.is_large_string(
                col.type
            ):
                # an all-numeric / all-empty text column infers non-string
                t = t.set_column(
                    t.column_names.index("text"),
                    "text",
                    col.cast(pa.string()),
                )
        return docs_identity_batch(t, id_col=id_col)

    # "" is the ONLY null spelling: Arrow's default list also nulls
    # "nan"/"NaN", which would round-trip the writer's repr() of float
    # NaN (and keep "inf"/"-inf" from parsing as floats) to null
    # (advisory r4). Non-finite floats now survive the CSV edge.
    from pyarrow import csv as pacsv

    return rd.read_csv(
        files, convert_options=pacsv.ConvertOptions(null_values=[""])
    ).map_batches(adapt, batch_format="pyarrow")


def write_csv_docs(
    docs: Dataset,
    out_dir: str,
    *,
    columns: list[str] | None = None,
    gzip_output: bool = False,
) -> int:
    """docs Dataset -> one CSV shard per block under ``out_dir``;
    returns rows written. Distributed (each block written in-task);
    shard names derive from block content (min doc id + row count);
    header row always present; bytes hex-encoded; floats via repr
    (round-trip exact); gzip (when on) with pinned mtime."""
    os.makedirs(out_dir, exist_ok=True)
    if columns is not None:
        docs = docs.select_columns(columns)
    ext = ".csv.gz" if gzip_output else ".csv"

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"rows": pa.array([], pa.int64())})
        names = t.column_names
        rows = t.to_pylist()
        sio = io.StringIO()
        w = csv.writer(sio, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
        w.writerow(names)
        for r in rows:
            w.writerow(
                [
                    v.hex() if isinstance(v, bytes) else (repr(v) if isinstance(v, float) else v)
                    for v in (r[c] for c in names)
                ]
            )
        data = sio.getvalue().encode("utf-8")
        if gzip_output:
            data = gzip.compress(data, 6, mtime=0)
        # shard name from block CONTENT: min doc id when present, else a
        # digest of the serialized bytes — never the row count alone
        # (equal-sized blocks would collide and os.replace would silently
        # drop all but one; review finding). Byte-identical blocks still
        # coalesce by construction — that is the deterministic-name
        # contract, not a loss.
        import hashlib

        if "doc_id" in names:
            key = min(r["doc_id"] for r in rows)
        else:
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
