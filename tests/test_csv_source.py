"""CSV source/sink (sources/csvsrc.py): read canonicalization parity
with the Parquet path, distributed deterministic write, gzip
round-trip, quoting/edge characters, loud missing-column error."""

import csv
import glob
import gzip
import io
import os

import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.sources.csvsrc import read_csv_docs, write_csv_docs


def _write_fixture(path, rows, gz=False):
    sio = io.StringIO()
    w = csv.writer(sio, lineterminator="\n")
    w.writerow(["doc_id", "text", "lang"])
    for r in rows:
        w.writerow([r["doc_id"], r["text"], r["lang"]])
    data = sio.getvalue().encode()
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
    _write_fixture(str(d / "a.csv"), _rows(10))
    _write_fixture(str(d / "b.csv.gz"), _rows(10, off=10), gz=True)
    docs = read_csv_docs(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(docs) == 20
    assert set(docs.columns) >= {"doc_id", "text", "lang", "text_sha256"}
    assert docs.doc_id.tolist() == list(range(20))
    import hashlib

    want = hashlib.sha256(docs.loc[3, "text"].encode()).digest()
    assert bytes(docs.loc[3, "text_sha256"]) == want


def test_parity_with_parquet_path(ray_session, tmp_path):
    """The same rows through CSV and through from_arrow+identity must
    produce the IDENTICAL canonical docs table."""
    from raydedup.stages.extract import docs_identity_batch

    rows = _rows(25)
    _write_fixture(str(tmp_path / "x.csv"), rows)
    via_csv = (
        read_csv_docs(str(tmp_path / "x.csv"))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
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
    assert list(via_csv.columns) == list(via_pq.columns) or set(via_csv.columns) == set(via_pq.columns)
    for c in via_pq.columns:
        assert via_csv[c].tolist() == via_pq[c].tolist(), c


def test_roundtrip_and_quoting(ray_session, tmp_path):
    """Commas, quotes and newlines in text survive a write+read cycle."""
    from raydedup.stages.extract import docs_identity_batch

    texts = [
        'plain words',
        'has, commas, inside',
        'has "quotes" inside',
        'line one\nline two',
        '',
    ]
    src = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
            }
        )
    ).map_batches(docs_identity_batch, batch_format="pyarrow")
    out = str(tmp_path / "out")
    n = write_csv_docs(src, out, columns=["doc_id", "text", "lang"])
    assert n == len(texts)
    back = read_csv_docs(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["text"].fillna("").tolist() == texts


def test_write_is_deterministic(ray_session, tmp_path):
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
        write_csv_docs(src, out, columns=["doc_id", "text", "lang"], gzip_output=True)
        blob = b"".join(
            open(p, "rb").read() for p in sorted(glob.glob(os.path.join(out, "*")))
        )
        names = sorted(os.path.basename(p) for p in glob.glob(os.path.join(out, "*")))
        outs.append((names, blob))
    assert outs[0] == outs[1]


def test_missing_text_column_is_loud(ray_session, tmp_path):
    p = str(tmp_path / "bad.csv")
    with open(p, "w") as f:
        f.write("doc_id,lang\n1,en\n")
    with pytest.raises(Exception, match="text"):
        read_csv_docs(p).materialize()


def test_write_without_doc_id_keeps_all_blocks(ray_session, tmp_path):
    """Shard names must derive from block CONTENT, not row count:
    equal-sized doc_id-less blocks previously collided and os.replace
    silently dropped all but one (review finding)."""
    src = rd.from_arrow(
        pa.table(
            {
                "text": pa.array([f"body {i}" for i in range(40)]),
                "lang": pa.array(["en"] * 40),
            }
        )
    ).repartition(4).materialize()
    out = str(tmp_path / "noid")
    n = write_csv_docs(src, out)
    files = glob.glob(os.path.join(out, "*.csv"))
    rows_on_disk = sum(len(open(p).read().splitlines()) - 1 for p in files)
    assert n == 40
    assert rows_on_disk == 40, f"{len(files)} files, {rows_on_disk} rows"


def test_nonfinite_floats_roundtrip(ray_session, tmp_path):
    """NaN / +-inf in float columns survive the CSV edge: the reader
    restricts Arrow's null spellings to "" so the writer's repr()
    output parses back as floats, not null (advisory r4)."""
    import math

    import numpy as np

    from raydedup.stages.extract import docs_identity_batch

    vals = [float("nan"), float("inf"), float("-inf"), 1.25, None]
    src = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(vals))), pa.int64()),
                "text": pa.array([f"doc {i}" for i in range(len(vals))]),
                "score": pa.array(vals, pa.float64()),
            }
        )
    ).map_batches(docs_identity_batch, batch_format="pyarrow")
    out = str(tmp_path / "nf")
    assert write_csv_docs(src, out, columns=["doc_id", "text", "score"]) == len(vals)
    back = read_csv_docs(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    s = back["score"].tolist()
    assert math.isnan(s[0])
    assert s[1] == math.inf and s[2] == -math.inf and s[3] == 1.25
    assert back["score"].isna().tolist()[4] or np.isnan(s[4])
