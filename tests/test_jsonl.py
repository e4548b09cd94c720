"""JSONL source/sink (sources/jsonl.py): read canonicalization parity,
distributed deterministic write, gzip round-trip."""

import glob
import gzip
import json
import os

import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.sources.jsonl import read_jsonl_docs, write_jsonl_docs


def _write_fixture(path, rows, gz=False):
    data = ("\n".join(json.dumps(r) for r in rows) + "\n").encode()
    if gz:
        data = gzip.compress(data, 6, mtime=0)
    with open(path, "wb") as f:
        f.write(data)


def _rows(n=20, off=0):
    return [
        {"doc_id": off + i, "text": f"doc {off + i} body words here", "lang": "en"}
        for i in range(n)
    ]


def test_read_canonicalizes_identity(ray_session, tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_fixture(str(d / "a.jsonl"), _rows(10))
    _write_fixture(str(d / "b.jsonl.gz"), _rows(10, off=10), gz=True)
    docs = read_jsonl_docs(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(docs) == 20
    assert set(docs.columns) >= {"doc_id", "text", "lang", "text_sha256"}
    assert docs.doc_id.tolist() == list(range(20))
    # identity matches the canonical docs contract
    import hashlib

    want = hashlib.sha256(docs.loc[3, "text"].encode()).digest()
    assert bytes(docs.loc[3, "text_sha256"]) == want


def test_roundtrip_write_read(ray_session, tmp_path):
    src = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(30)), pa.int64()),
                "text": pa.array([f"t {i} xyz" for i in range(30)]),
                "lang": pa.array(["en"] * 30),
            }
        )
    )
    from raydedup.stages.extract import docs_identity_batch

    canon = src.map_batches(docs_identity_batch, batch_format="pyarrow")
    out = str(tmp_path / "out")
    n = write_jsonl_docs(canon, out, gzip_output=True)
    assert n == 30
    files = glob.glob(os.path.join(out, "*.jsonl.gz"))
    assert files
    back = (
        read_jsonl_docs(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert back.doc_id.tolist() == list(range(30))
    assert back.text.tolist() == [f"t {i} xyz" for i in range(30)]


def test_write_deterministic_bytes(ray_session, tmp_path):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(12)), pa.int64()),
            "text": pa.array([f"d{i}" for i in range(12)]),
        }
    )
    outs = []
    for tag in ("x", "y"):
        out = str(tmp_path / tag)
        write_jsonl_docs(rd.from_arrow(t), out)
        (f,) = glob.glob(os.path.join(out, "*.jsonl"))
        outs.append((os.path.basename(f), open(f, "rb").read()))
    assert outs[0] == outs[1]  # same name, same bytes


def test_missing_input_raises(ray_session, tmp_path):
    with pytest.raises(FileNotFoundError):
        read_jsonl_docs(str(tmp_path / "empty_dir_missing"))
