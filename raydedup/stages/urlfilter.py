"""URL blocklist filtering: drop pages whose url matches any of a
pattern list, with per-pattern accounting.

The first gate of every crawl-curation pipeline (calendar pages,
search-result and tag listings, session-id urls are crawler traps, not
content). Patterns are RE2 — one ``pc.match_substring_regex`` kernel
per pattern over the whole column, first-match-wins attribution (the
pattern ORDER is part of the spec), and DuckDB's ``regexp_matches`` is
RE2 too, so the oracle embeds the literal same strings. Stateless,
row-local, zero shuffle; per-pattern hit counts come back as a
combiner-summed report, never a driver scan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# public-knowledge default blocklist (crawler-trap shapes)
DEFAULT_URL_BLOCKLIST: tuple[str, ...] = (
    r"[?&]sessionid=",
    r"/tag/",
    r"/search\?",
    r"/calendar/",
    r"/page/\d{3,}",
)


def url_block_batch(
    t: pa.Table, patterns: tuple[str, ...], url_col: str = "url"
) -> pa.Table:
    """batch -> batch + ``blocked_by`` (first matching pattern index,
    -1 = clean)."""
    url = pc.cast(pc.fill_null(t.column(url_col), ""), pa.large_string())
    idx = np.full(t.num_rows, -1, dtype=np.int64)
    undecided = np.ones(t.num_rows, dtype=bool)
    for i, pat in enumerate(patterns):
        if not undecided.any():
            break
        m = pc.match_substring_regex(url, pat).to_numpy(zero_copy_only=False)
        hit = m & undecided
        idx[hit] = i
        undecided &= ~m
    return t.append_column("blocked_by", pa.array(idx, pa.int64()))


def url_filter(
    docs: Dataset,
    patterns: tuple[str, ...] = DEFAULT_URL_BLOCKLIST,
    url_col: str = "url",
) -> Dataset:
    """Stream of docs whose url matches NO blocklist pattern."""

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        out = url_block_batch(t, patterns, url_col)
        kept = out.filter(pc.equal(out.column("blocked_by"), -1))
        return kept.drop_columns(["blocked_by"])

    return docs.map_batches(keep, batch_format="pyarrow")


def url_filter_report(
    docs: Dataset,
    patterns: tuple[str, ...] = DEFAULT_URL_BLOCKLIST,
    url_col: str = "url",
) -> pa.Table:
    """(pattern_idx, pattern, n_docs) per blocklist pattern (hits only,
    first-match-wins), ordered by pattern_idx."""

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table(
                {"i": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        out = url_block_batch(t, patterns, url_col)
        b = out.column("blocked_by").to_numpy(zero_copy_only=False)
        cnt = np.bincount(b[b >= 0], minlength=len(patterns))
        nz = np.flatnonzero(cnt)
        return pa.table(
            {
                "i": pa.array(nz.astype(np.int64), pa.int64()),
                "n": pa.array(cnt[nz].astype(np.int64), pa.int64()),
            }
        )

    agg = np.zeros(len(patterns), dtype=np.int64)
    parts = docs.select_columns([url_col]).map_batches(part, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for i, n in zip(b.column("i").to_pylist(), b.column("n").to_pylist()):
            agg[i] += n
    nz = np.flatnonzero(agg)
    return pa.table(
        {
            "pattern_idx": pa.array(nz.astype(np.int64), pa.int64()),
            "pattern": pa.array([patterns[i] for i in nz], pa.large_string()),
            "n_docs": pa.array(agg[nz], pa.int64()),
        }
    )
