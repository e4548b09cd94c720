"""Resumable sharded export: the training-corpus SINK.

The reference's output surface is a formatted stdout dump
(``cli/Panako.java:296-319``) plus the per-resource ``.tdb`` file cache
that lets a re-run skip finished work (``OlafStorageFile.java:106-191``,
read-back ``OlafStrategy.java:175-201``). At 100 TB the analog is the
final corpus write itself: one Parquet directory per HASH SHARD with a
manifest, so a failed export re-run skips every shard that already
landed — never one giant file, never a restart from zero.

Layout:

    out_dir/
      manifest.json            {"seed":…, "n_shards":…, "shards": {"0":
                                {"status":"done","rows":…}, …}}
      shard=0000/part.parquet
      shard=0001/part.parquet

Shard assignment is ``mix64(doc_id XOR seed) % n_shards`` — the same
deterministic, partition-invariant rank the sampling stage uses, so the
layout is reproducible across runs, block layouts and cluster sizes,
and doubles as the training-order shuffle (within a shard, rows are
ordered by the SAME mix64 rank, tie doc_id). One Ray task per shard
writes its file and only then is the shard marked done (atomic manifest
replace) — a kill at any instant leaves either a finished shard or a
to-be-redone one, never a half-counted one.

Scale shape: one hash exchange keyed on the shard id (the kernel sorts
its shard by rank and writes Parquet inside the reduce task); the
driver holds only the manifest dict — O(n_shards), never rows.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from raydedup.hashing import mix64
from raydedup.stages.sampling import DEFAULT_SAMPLE_SEED

U64 = np.uint64


def shard_of_ids(ids: np.ndarray, n_shards: int, seed: int) -> np.ndarray:
    """Deterministic shard id per doc: mix64(doc_id XOR seed) % n_shards.
    The rank (mix64 value >> 1, int64-safe) orders rows WITHIN a shard."""
    return (mix64(ids.astype(np.int64).view(U64) ^ U64(seed)) % U64(n_shards)).astype(
        np.int64
    )


def rank_of_ids(ids: np.ndarray, seed: int) -> np.ndarray:
    return (mix64(ids.astype(np.int64).view(U64) ^ U64(seed)) >> U64(1)).astype(
        np.int64
    )


def _load_manifest(out_dir: str, n_shards: int, seed: int) -> dict:
    path = os.path.join(out_dir, "manifest.json")
    if os.path.exists(path):
        with open(path) as f:
            m = json.load(f)
        if m.get("n_shards") != n_shards or m.get("seed") != seed:
            raise ValueError(
                f"export manifest at {path} was written with "
                f"n_shards={m.get('n_shards')} seed={m.get('seed')}; "
                f"refusing to resume with n_shards={n_shards} seed={seed}"
            )
        return m
    return {"n_shards": n_shards, "seed": seed, "shards": {}}


def _save_manifest(out_dir: str, manifest: dict) -> None:
    path = os.path.join(out_dir, "manifest.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


@ray.remote
def _write_shard(shard: int, out_dir: str, id_col: str, *parts: pa.Table) -> int:
    """Concatenate one shard's bucket parts, order by (rank, doc_id),
    write atomically. Returns the row count."""
    import pyarrow.parquet as pq

    tables = [p for p in parts if p.num_rows and p.num_columns]
    sdir = os.path.join(out_dir, f"shard={shard:04d}")
    os.makedirs(sdir, exist_ok=True)
    if not tables:
        # an empty shard gets its directory but no file (readers glob)
        return 0
    dest = os.path.join(sdir, "part.parquet")
    t = pa.concat_tables(tables, promote_options="default")
    rk = t.column("_rank").to_numpy(zero_copy_only=False)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, rk))
    t = t.drop_columns(["_rank", "_shard"]).take(pa.array(order))
    tmp = dest + f".tmp.{os.getpid()}"
    pq.write_table(t, tmp)
    os.replace(tmp, dest)
    return t.num_rows


def export_shards(
    docs: Dataset,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    seed: int = DEFAULT_SAMPLE_SEED,
) -> dict:
    """Write ``docs`` as ``n_shards`` hash-sharded, rank-shuffled
    Parquet directories under ``out_dir``, skipping shards the manifest
    already marks done. Returns a summary dict."""
    from raydedup.stages.exchange import split_dataset

    os.makedirs(out_dir, exist_ok=True)
    manifest = _load_manifest(out_dir, n_shards, seed)
    todo = [
        s for s in range(n_shards) if manifest["shards"].get(str(s), {}).get("status") != "done"
    ]
    if not todo:
        return {
            "out": out_dir,
            "shards": n_shards,
            "written": 0,
            "skipped": n_shards,
            "rows": sum(v["rows"] for v in manifest["shards"].values()),
        }

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"_shard": pa.array([], pa.int64())})
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "_shard", pa.array(shard_of_ids(ids, n_shards, seed), pa.int64())
        ).append_column("_rank", pa.array(rank_of_ids(ids, seed), pa.int64()))

    prepped = docs.map_batches(prep, batch_format="pyarrow")
    # shard ids ARE the bucket ids: split on _shard with num_buckets =
    # n_shards, so each reduce task sees exactly one output shard
    splits = split_dataset(prepped, "_shard", n_shards)
    refs = {
        s: _write_shard.remote(s, out_dir, id_col, *[sp[s] for sp in splits])
        for s in todo
    }
    written = 0
    for s, ref in refs.items():
        n = ray.get(ref)
        manifest["shards"][str(s)] = {
            "status": "done",
            "rows": n,
            "ts": time.time(),
        }
        _save_manifest(out_dir, manifest)
        written += 1
    return {
        "out": out_dir,
        "shards": n_shards,
        "written": written,
        "skipped": n_shards - len(todo),
        "rows": sum(v["rows"] for v in manifest["shards"].values()),
    }
