"""Arrow IPC source/sink (sources/ipcsrc.py): canonicalization parity
with the Parquet path, round-trip, deterministic distributed writes,
doc_id-less shard naming (no collisions), loud missing-column error."""

import glob
import os

import pyarrow as pa
import pyarrow.ipc as pipc
import pytest

import ray.data as rd

from raydedup.sources.ipcsrc import read_ipc_docs, write_ipc_docs


def _write_fixture(path, rows):
    t = pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "text": pa.array([r["text"] for r in rows]),
            "lang": pa.array([r["lang"] for r in rows]),
        }
    )
    with pipc.new_file(path, t.schema) as w:
        w.write_table(t)


def _rows(n=20, off=0):
    return [
        {"doc_id": off + i, "text": f"doc {off + i} body words", "lang": "en"}
        for i in range(n)
    ]


def test_read_canonicalizes_and_parity(ray_session, tmp_path):
    from raydedup.stages.extract import docs_identity_batch

    d = tmp_path / "in"
    d.mkdir()
    _write_fixture(str(d / "a.arrow"), _rows(10))
    _write_fixture(str(d / "b.feather"), _rows(10, off=10))
    via_ipc = (
        read_ipc_docs(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(via_ipc) == 20
    rows = _rows(10) + _rows(10, off=10)
    src = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                "text": pa.array([r["text"] for r in rows]),
                "lang": pa.array([r["lang"] for r in rows]),
            }
        )
    )
    via_pq = (
        src.map_batches(docs_identity_batch, batch_format="pyarrow")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for c in via_pq.columns:
        assert via_ipc[c].tolist() == via_pq[c].tolist(), c


def test_roundtrip_and_determinism(ray_session, tmp_path):
    from raydedup.stages.extract import docs_identity_batch

    src = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(40)), pa.int64()),
                "text": pa.array([f"t {i} body" for i in range(40)]),
                "lang": pa.array(["en"] * 40),
            }
        )
    ).map_batches(docs_identity_batch, batch_format="pyarrow").repartition(4).materialize()
    outs = []
    for sub in ("o1", "o2"):
        out = str(tmp_path / sub)
        n = write_ipc_docs(src, out, columns=["doc_id", "text", "lang"])
        assert n == 40
        names = sorted(os.path.basename(p) for p in glob.glob(os.path.join(out, "*")))
        blob = b"".join(
            open(p, "rb").read()
            for p in sorted(glob.glob(os.path.join(out, "*")))
        )
        outs.append((names, blob))
    assert outs[0] == outs[1]
    back = (
        read_ipc_docs(str(tmp_path / "o1"))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert back["text"].tolist() == [f"t {i} body" for i in range(40)]


def test_write_without_doc_id_keeps_all_blocks(ray_session, tmp_path):
    src = rd.from_arrow(
        pa.table(
            {
                "text": pa.array([f"body {i}" for i in range(40)]),
                "lang": pa.array(["en"] * 40),
            }
        )
    ).repartition(4).materialize()
    out = str(tmp_path / "noid")
    n = write_ipc_docs(src, out)
    rows_on_disk = 0
    for p in glob.glob(os.path.join(out, "*.arrow")):
        with pa.memory_map(p, "r") as srcf:
            rows_on_disk += pipc.open_file(srcf).read_all().num_rows
    assert n == 40 and rows_on_disk == 40


def test_missing_text_column_is_loud(ray_session, tmp_path):
    p = str(tmp_path / "bad.arrow")
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "lang": pa.array(["en"])})
    with pipc.new_file(p, t.schema) as w:
        w.write_table(t)
    with pytest.raises(Exception, match="text"):
        read_ipc_docs(p).materialize()
