"""WARC source: read Common-Crawl-style web archives into pages rows.

The reference's decode front-end accepts ANY container and
canonicalizes it through one pipe (ffmpeg template,
``util/Key.java:85``; dispatch ``cli/Panako.java:106-114``). The
web-text corpus's native container is WARC — the ISO 28500 archive
format Common Crawl ships — so this module closes the "another source
format" gap the same way: a stateless parser turns raw WARC bytes
(plain or gzip, whole-file or member-per-record as CC writes them —
stdlib ``gzip`` handles both, multi-member streams decode
transparently) into the canonical ``pages`` schema
``(url, warc_ts, html, lang)``, after which every existing stage
(extract, dedup, curate, watch) runs unchanged.

Scale shape: one read task per WARC file (`read_warc_pages` mirrors
``read_pages``'s task sizing); record parsing is a single linear scan
over the decompressed buffer (find-based, no per-line Python beyond
the header block of each record); only ``WARC-Type: response``
records with an HTTP payload become rows. A deterministic fixture
writer (``write_warc``) makes round-trip tests and synthetic-corpus
parity checks self-contained — no external data.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from datetime import datetime, timezone
from typing import Iterator

import numpy as np
import pyarrow as pa

from ray.data import Dataset

WARC_PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("lang", pa.string()),
    ]
)

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


class WarcError(ValueError):
    pass


def _warc_date(dt: datetime) -> str:
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def write_warc(
    records: list[dict],
    path: str,
    *,
    gzip_mode: str = "none",
) -> None:
    """Deterministic WARC/1.0 writer (fixtures + parquet->warc export).

    ``records``: dicts with ``url`` (str), ``ts`` (datetime), ``html``
    (bytes), optional ``lang``. ``gzip_mode``: "none" (plain),
    "record" (one gzip member per record — Common Crawl's layout), or
    "file" (whole file one member)."""
    if gzip_mode not in ("none", "record", "file"):
        raise ValueError(f"unknown gzip_mode {gzip_mode!r}")
    out = io.BytesIO()
    for r in records:
        html = bytes(r["html"])
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
            + html
        )
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + b"WARC-Target-URI: " + r["url"].encode("utf-8") + _CRLF
            + b"WARC-Date: " + _warc_date(r["ts"]).encode() + _CRLF
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        )
        rec = head + http + _CRLF + _CRLF
        if gzip_mode == "record":
            # mtime pinned: byte-deterministic output across runs
            out.write(gzip.compress(rec, 6, mtime=0))
        else:
            out.write(rec)
    data = out.getvalue()
    if gzip_mode == "file":
        data = gzip.compress(data, 6, mtime=0)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Linear scan over (decompressed) WARC bytes -> (headers, block)
    per record. Header names are lower-cased; the block is the raw
    Content-Length bytes (for responses: the full HTTP message)."""
    if data[:2] == _GZIP_MAGIC:
        data = gzip.decompress(data)  # multi-member streams concatenate
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate record separators / trailing newlines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise WarcError(f"expected WARC version at offset {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise WarcError("truncated record header")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                "utf-8", errors="replace"
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise WarcError("record without valid Content-Length") from e
        body_start = hdr_end + 4
        if body_start + length > n:
            raise WarcError("truncated record block")
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def _http_body(block: bytes) -> bytes | None:
    """HTTP response message -> body bytes (None when not parseable)."""
    if not block.startswith(b"HTTP/"):
        return None
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None
    return block[sep + 4 :]


def parse_warc_pages(data: bytes, *, lang: str = "") -> pa.Table:
    """WARC bytes -> pages table (response records with an HTTP body)."""
    urls: list[str] = []
    ts: list[int] = []
    htmls: list[bytes] = []
    for headers, block in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        body = _http_body(block)
        if body is None:
            continue
        date = headers.get("warc-date", "1970-01-01T00:00:00Z")
        try:
            dt = datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ").replace(
                tzinfo=timezone.utc
            )
        except ValueError:
            dt = datetime(1970, 1, 1, tzinfo=timezone.utc)
        urls.append(url)
        ts.append(int(dt.timestamp() * 1_000_000))
        htmls.append(body)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                np.array(ts, dtype=np.int64), pa.timestamp("us")
            ),
            "html": pa.array(htmls, pa.large_binary()),
            "lang": pa.array([lang] * len(urls), pa.string()),
        },
        schema=WARC_PAGES_SCHEMA,
    )


def read_warc_pages(path_or_paths, *, lang: str = "") -> Dataset:
    """WARC file(s)/dir -> pages Dataset (url, warc_ts, html, lang) —
    a drop-in sibling of ``read_pages``: feed the result straight to
    ``pages_to_docs`` and every downstream pipeline runs unchanged.

    One read task per file (WARC shards are the parallelism unit,
    exactly like the reference's one-task-per-audio-file store); output
    blocks still split dynamically at the target block size."""
    import ray.data as rd

    if isinstance(path_or_paths, (list, tuple)):
        files = [str(p) for p in path_or_paths]
    elif os.path.isdir(path_or_paths):
        files = sorted(
            _glob.glob(os.path.join(path_or_paths, "*.warc"))
            + _glob.glob(os.path.join(path_or_paths, "*.warc.gz"))
        )
    else:
        files = [path_or_paths]
    if not files:
        return rd.from_arrow(WARC_PAGES_SCHEMA.empty_table())

    def load(batch: pa.Table) -> pa.Table:
        parts = []
        for p in batch.column("path").to_pylist():
            with open(p, "rb") as f:
                parts.append(parse_warc_pages(f.read(), lang=lang))
        return (
            pa.concat_tables(parts) if parts else WARC_PAGES_SCHEMA.empty_table()
        )

    paths_ds = rd.from_arrow(
        pa.table({"path": pa.array(files, pa.string())})
    ).repartition(len(files))
    return paths_ds.map_batches(load, batch_format="pyarrow", batch_size=1)
