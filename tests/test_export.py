"""Resumable sharded export (stages/export.py): layout determinism,
manifest resume semantics, parameter-mismatch refusal."""

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from raydedup.hashing import mix64
from raydedup.stages.export import export_shards, rank_of_ids, shard_of_ids
from raydedup.stages.sampling import DEFAULT_SAMPLE_SEED


def _docs(n=500):
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array([f"doc number {i} body" for i in range(n)]),
        }
    )


def _read_all(out):
    frames = []
    for f in sorted(glob.glob(os.path.join(out, "shard=*", "part.parquet"))):
        shard = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        t = pq.read_table(f).to_pandas()
        t["shard"] = shard
        frames.append(t)
    return pd.concat(frames, ignore_index=True)


def test_layout_matches_reference(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    t = _docs()
    summary = export_shards(rd.from_arrow(t).repartition(7), out, n_shards=8)
    assert summary["written"] == 8 and summary["rows"] == 500
    got = _read_all(out)
    assert len(got) == 500 and set(got.columns) == {"doc_id", "text", "shard"}
    ids = got.doc_id.to_numpy()
    # shard assignment matches the kernel
    assert (got.shard.to_numpy() == shard_of_ids(ids, 8, DEFAULT_SAMPLE_SEED)).all()
    # within-shard order is (rank, doc_id)
    for s, g in got.groupby("shard"):
        rk = rank_of_ids(g.doc_id.to_numpy(), DEFAULT_SAMPLE_SEED)
        assert (np.lexsort((g.doc_id.to_numpy(), rk)) == np.arange(len(g))).all()
    # manifest covers every shard
    m = json.load(open(os.path.join(out, "manifest.json")))
    assert len(m["shards"]) == 8
    assert sum(v["rows"] for v in m["shards"].values()) == 500


def test_resume_skips_done_shards(ray_session, tmp_path):
    out = str(tmp_path / "exp2")
    t = _docs(300)
    export_shards(rd.from_arrow(t), out, n_shards=8)
    before = _read_all(out).sort_values(["shard", "doc_id"]).reset_index(drop=True)

    # full re-run: everything skipped, nothing rewritten
    s2 = export_shards(rd.from_arrow(t), out, n_shards=8)
    assert s2["written"] == 0 and s2["skipped"] == 8 and s2["rows"] == 300

    # simulate a crash: two shards lost their files and manifest rows
    m = json.load(open(os.path.join(out, "manifest.json")))
    for s in ("2", "5"):
        del m["shards"][s]
        shutil.rmtree(os.path.join(out, f"shard={int(s):04d}"))
    json.dump(m, open(os.path.join(out, "manifest.json"), "w"))
    s3 = export_shards(rd.from_arrow(t), out, n_shards=8)
    assert s3["written"] == 2 and s3["skipped"] == 6 and s3["rows"] == 300
    after = _read_all(out).sort_values(["shard", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(before, after)


def test_param_mismatch_refused(ray_session, tmp_path):
    out = str(tmp_path / "exp3")
    export_shards(rd.from_arrow(_docs(50)), out, n_shards=4)
    with pytest.raises(ValueError, match="refusing to resume"):
        export_shards(rd.from_arrow(_docs(50)), out, n_shards=8)
