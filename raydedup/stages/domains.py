"""Per-domain operators: host extraction, per-domain aggregate stats,
and a per-domain document cap.

Grafts the A6 storage-statistics surface
(``PanakoStorageKV.java:381-467``) and the K3 result truncation
(``OlafStrategy.java:543-557``) onto the axis that matters for a web
crawl: a handful of hosts dominating the corpus. Production web
pipelines cap documents per registered domain so no single site
overwhelms the training mix; this module is that cap plus the per-host
statistics that justify it.

Scale shape:
- host extraction is a fixed chain of RE2 regex passes over the whole
  Arrow column (`pc.replace_substring_regex`) — zero per-row Python,
  and DuckDB's `regexp_replace` is RE2 too, so the SQL oracle embeds
  the LITERAL same pattern strings.
- `domain_stats` is combiner-FIRST: each batch pre-aggregates
  (host -> n_docs, sum(value)) via np.unique + bincount, so only one
  row per host PER BLOCK enters the single hash exchange; at crawl
  scale the exchange moves |hosts|x|blocks| skinny rows, never docs.
- `cap_per_domain` reuses the group_topk exchange (one shuffle, ranks
  by run arithmetic) with a splitmix64 sampling rank, so the kept
  subset is deterministic and partition-invariant.

Assumptions: absolute http(s)-style urls (scheme present). The
registered-domain reduction is the naive last-two-labels rule — a real
deployment would swap in the public-suffix list; the operator shape
(vectorized column pass) is unchanged by that swap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from raydedup.stages.sampling import DEFAULT_SAMPLE_SEED

# (pattern, replacement) passes from url -> lowercased host; the SQL
# mirror embeds these literal strings, in this order.
HOST_PASSES: list[tuple[str, str]] = [
    (r"^[A-Za-z][A-Za-z0-9+.-]*://", ""),  # drop the scheme
    (r"^[^/?#]*@", ""),  # drop userinfo (only before any / ? #)
    (r"[/:?#].*$", ""),  # truncate at path / port / query / fragment
]

# host -> registered domain (naive eTLD+1: keep the last two labels).
# Anchored + greedy '^.*\.' leaves exactly two labels; a 2-label host
# does not match and passes through unchanged.
REGISTERED_PASS: tuple[str, str] = (r"^.*\.([^.]+\.[^.]+)$", r"\1")


def host_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized url column -> lowercased host column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.cast(col, pa.string())
    for pat, rep in HOST_PASSES:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    return pc.utf8_lower(s)


def registered_domain_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized url column -> registered domain (last two host labels)."""
    h = host_column(col)
    pat, rep = REGISTERED_PASS
    return pc.replace_substring_regex(h, pattern=pat, replacement=rep)


def add_host(
    ds: Dataset,
    url_col: str = "url",
    out_col: str = "host",
    registered: bool = False,
) -> Dataset:
    """Append the (registered-)host of ``url_col`` as ``out_col``."""
    fn = registered_domain_column if registered else host_column

    def batch(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        return t.append_column(out_col, fn(t.column(url_col)))

    return ds.map_batches(batch, batch_format="pyarrow")


def _combine_host_partials(t: pa.Table, host_col: str, val_col: str) -> pa.Table:
    """(host, n_docs, total) partials of one table. Grouping is Arrow
    dictionary_encode (native hashing) + integer bincount — the full
    column is never materialized as Python strings; only the UNIQUE
    hosts surface."""
    col = t.column(host_col)
    enc = pc.dictionary_encode(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    )
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_uniq = len(enc.dictionary)
    vals = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
    n = np.bincount(codes, minlength=n_uniq).astype(np.int64)
    tot = np.bincount(codes, weights=vals, minlength=n_uniq).astype(np.int64)
    return pa.table(
        {
            host_col: pc.cast(enc.dictionary, pa.string()),
            "n_docs": pa.array(n, type=pa.int64()),
            "total_chars": pa.array(tot, type=pa.int64()),
        }
    )


def domain_stats(
    ds: Dataset,
    url_col: str = "url",
    val_col: str = "n_chars",
    host_col: str = "host",
    registered: bool = False,
    num_buckets: int | None = None,
) -> Dataset:
    """Per-host document counts + value totals + mean.

    One hash exchange keyed on a stable string hash of the host; each
    input block is pre-reduced to per-host partials first, so exchange
    volume is O(hosts x blocks). The mean is ONE final IEEE division
    per host (total/n), matching the SQL mirror's
    ``sum(..) * 1.0 / count(*)`` textual order.
    """
    from raydedup.hashing import hash_strings_u64
    from raydedup.stages.exchange import hash_exchange_apply, refs_to_dataset

    out_schema = pa.schema(
        [
            (host_col, pa.string()),
            ("n_docs", pa.int64()),
            ("total_chars", pa.int64()),
            ("avg_chars", pa.float64()),
        ]
    )

    hosted = add_host(ds, url_col, host_col, registered=registered)

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.table({"_hkey": pa.array([], pa.int64())})
        part = _combine_host_partials(t, host_col, val_col)
        key = hash_strings_u64(part.column(host_col).to_pylist(), mixed=True)
        return part.append_column("_hkey", pa.array(key.view(np.int64), pa.int64()))

    prepped = hosted.map_batches(prep, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        if t is None or t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        col = t.column(host_col)
        enc = pc.dictionary_encode(
            col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_uniq = len(enc.dictionary)
        n = t.column("n_docs").to_numpy(zero_copy_only=False)
        tot = t.column("total_chars").to_numpy(zero_copy_only=False)
        n_m = np.bincount(codes, weights=n, minlength=n_uniq).astype(np.int64)
        t_m = np.bincount(codes, weights=tot, minlength=n_uniq).astype(np.int64)
        return pa.table(
            {
                host_col: pc.cast(enc.dictionary, pa.string()),
                "n_docs": pa.array(n_m, type=pa.int64()),
                "total_chars": pa.array(t_m, type=pa.int64()),
                "avg_chars": pa.array(t_m.astype(np.float64) / n_m, pa.float64()),
            }
        )

    refs = hash_exchange_apply(prepped, "_hkey", bucket, num_buckets, collect=False)
    return refs_to_dataset(refs, out_schema)


def cap_per_domain(
    ds: Dataset,
    url_col: str = "url",
    id_col: str = "doc_id",
    k: int = 5,
    seed: int = DEFAULT_SAMPLE_SEED,
    registered: bool = True,
    domain_col: str = "domain",
) -> Dataset:
    """Keep a deterministic pseudo-random sample of at most ``k`` docs
    per (registered) domain: rank = splitmix64(doc_id XOR seed) >> 1
    (top bit dropped so the DESC order is identical in signed int64 and
    UBIGINT), ordered DESC with doc_id ASC ties — then the group_topk
    exchange. Output: (domain, doc_id, rank)."""
    from raydedup.hashing import mix64
    from raydedup.stages.grouptopk import group_topk

    hosted = add_host(ds, url_col, domain_col, registered=registered)

    def with_rank(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        rk = mix64(ids ^ np.uint64(seed)) >> np.uint64(1)
        return t.append_column("_rk", pa.array(rk.astype(np.int64), pa.int64()))

    ranked = hosted.map_batches(with_rank, batch_format="pyarrow")
    return group_topk(
        ranked,
        group_col=domain_col,
        order_col="_rk",
        tie_col=id_col,
        k=k,
        columns=[domain_col, "_rk", id_col],
    )
