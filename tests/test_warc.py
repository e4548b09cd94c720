"""WARC source (sources/warc.py): round-trips, gzip layouts, malformed
inputs, and drop-in parity with the parquet pages path."""

import glob
import gzip
import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from raydedup.sources.warc import (
    WarcError,
    iter_warc_records,
    parse_warc_pages,
    read_warc_pages,
    write_warc,
)


def _records(n=5):
    return [
        {
            "url": f"https://w.example/p/{i}",
            "ts": datetime(2026, 3, 1, 12, 0, i, tzinfo=timezone.utc),
            "html": f"<html><body><main>doc {i} body</main></body></html>".encode(),
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("gzip_mode", ["none", "record", "file"])
def test_roundtrip_all_layouts(tmp_path, gzip_mode):
    recs = _records()
    p = str(tmp_path / f"a.warc{'.gz' if gzip_mode != 'none' else ''}")
    write_warc(recs, p, gzip_mode=gzip_mode)
    t = parse_warc_pages(open(p, "rb").read())
    assert t.num_rows == len(recs)
    assert t.column("url").to_pylist() == [r["url"] for r in recs]
    assert t.column("html").to_pylist() == [r["html"] for r in recs]
    ts = t.column("warc_ts").to_pylist()
    assert ts == [r["ts"].replace(tzinfo=None) for r in recs]


def test_writer_is_byte_deterministic(tmp_path):
    recs = _records(3)
    a, b = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    write_warc(recs, a, gzip_mode="record")
    write_warc(recs, b, gzip_mode="record")
    assert open(a, "rb").read() == open(b, "rb").read()


def test_non_response_records_skipped(tmp_path):
    info = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 10\r\n\r\n"
        b"x: y\r\n\r\n\r\n\r\n"
    )
    p = str(tmp_path / "m.warc")
    write_warc(_records(2), p)
    data = info + open(p, "rb").read()
    t = parse_warc_pages(data)
    assert t.num_rows == 2
    # the warcinfo record still parses structurally
    assert sum(1 for _ in iter_warc_records(data)) == 3


def test_malformed_inputs_raise_warcerror(tmp_path):
    p = str(tmp_path / "g.warc")
    write_warc(_records(2), p)
    good = open(p, "rb").read()
    with pytest.raises(WarcError, match="truncated record block"):
        list(iter_warc_records(good[:-40]))
    with pytest.raises(WarcError, match="expected WARC version"):
        list(iter_warc_records(b"NOPE/1.0\r\n\r\n\r\n"))
    no_len = (
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
    )
    with pytest.raises(WarcError, match="Content-Length"):
        list(iter_warc_records(no_len))


def test_parity_with_parquet_pages_path(ray_session, small_corpus, tmp_path):
    """A pages shard exported to WARC and read back through
    read_warc_pages -> pages_to_docs produces the IDENTICAL docs table
    (doc_id, url, text, text_sha256) as the parquet path — WARC is a
    drop-in container for every downstream pipeline."""
    from raydedup.sources.pages import pages_to_docs, read_pages

    spec, paths = small_corpus
    shard = sorted(glob.glob(os.path.join(paths["pages"], "*.parquet")))[0]
    t = pq.read_table(shard)
    recs = [
        {
            "url": u,
            "ts": ts.replace(tzinfo=timezone.utc),
            "html": h,
            "lang": lg,
        }
        for u, ts, h, lg in zip(
            t.column("url").to_pylist(),
            t.column("warc_ts").to_pylist(),
            t.column("html").to_pylist(),
            t.column("lang").to_pylist(),
        )
    ]
    wdir = tmp_path / "warcs"
    wdir.mkdir()
    write_warc(recs[: len(recs) // 2], str(wdir / "a.warc.gz"), gzip_mode="record")
    write_warc(recs[len(recs) // 2 :], str(wdir / "b.warc"), gzip_mode="none")

    via_warc = (
        pages_to_docs(read_warc_pages(str(wdir)))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    via_parquet = (
        pages_to_docs(read_pages(shard))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = ["doc_id", "url", "text", "text_sha256"]
    assert via_warc[cols].equals(via_parquet[cols])


def test_warc2parquet_cli(ray_session, tmp_path, monkeypatch):
    import raydedup.cli as cli
    from raydedup.cli import main

    # keep the session-scoped Ray fixture alive through main()'s finally
    monkeypatch.setattr(cli, "_shutdown_ray", lambda: None)

    wdir = tmp_path / "w"
    wdir.mkdir()
    write_warc(_records(4), str(wdir / "x.warc.gz"), gzip_mode="record")
    out = str(tmp_path / "pages_out")
    rc = main(["warc2parquet", str(wdir), out])
    assert rc == 0
    total = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(out, "*.parquet"))
    )
    assert total == 4
