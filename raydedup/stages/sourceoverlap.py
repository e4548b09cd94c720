"""Cross-source shingle-overlap matrix: exact pairwise Jaccard between
the distinct word-5-gram shingle sets of each corpus source.

The corpus-level contamination / provenance diagnostic: which slices of
a training mix share substantial text (a mirror crawled twice, a feed
syndicated across sites, an eval suite leaking into a source) — the
corpus-pair analog of the per-document near-dup pass, read before
deciding which sources to keep or down-weight.

Scale shape:

1. the distinct source list is collected first (tiny by assumption —
   sources are feeds/crawls/hosts, not documents; ≤ 4096 enforced so
   the S² output matrix stays small) and the source→index map ships in
   the task closure.
2. per-batch combiner reuses the flagship shingle emission
   (``dupngrams._posting_batches``) with the SOURCE INDEX standing in
   for the doc id, so postings dedup to distinct (shingle, source)
   pairs before the exchange — a batch of near-identical same-source
   pages costs one posting per shingle.
3. ONE exchange on the shingle hash; each bucket dedups its (shingle,
   source) pairs, builds a 0/1 shingle-run x source membership matrix
   in row chunks and accumulates ``C = B^T @ B`` — every pairwise
   co-occurrence count AND the per-source distinct counts (diag) in
   one BLAS call per chunk, O(S^2) rows per bucket regardless of
   shingle volume.
4. the driver sums the tiny per-bucket partials and computes the ONE
   IEEE division per source pair.

Oracle mirror: the shared word-5-gram CTE (`_SHINGLES_CTE`) joined to
sources with DISTINCT, self-joined per pair — exact string-level
Jaccard; the kernel counts mixed 64-bit shingle hashes (collisions
negligible, same accepted assumption as dup_ngram_fraction).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

I64 = np.int64
U64 = np.uint64

OUT_SCHEMA = pa.schema(
    [
        ("src_a", pa.large_string()),
        ("src_b", pa.large_string()),
        ("n_a", pa.int64()),
        ("n_b", pa.int64()),
        ("n_common", pa.int64()),
        ("jaccard", pa.float64()),
    ]
)

_PART_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64()), ("n", pa.int64())])


def distinct_sources(docs: Dataset, col: str = "source") -> list[str]:
    """Sorted distinct values of ``col`` via per-block unique partials
    (one tiny row set per block reaches the driver)."""

    def part(t: pa.Table) -> pa.Table:
        u = pc.unique(pc.fill_null(t.column(col), ""))
        return pa.table({col: pc.cast(u, pa.large_string())})

    parts = docs.select_columns([col]).map_batches(part, batch_format="pyarrow")
    vals = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        vals.update(b.column(col).to_pylist())
    return sorted(vals)


def _bucket_pair_partial(t: pa.Table, n_src: int) -> pa.Table:
    """bucket (sh, doc_id=src_idx) -> (a, b, n) rows: a==b gives the
    source's distinct-shingle count in this bucket, a<b the pair's
    co-occurrence count. O(n_src^2) output rows.

    Kernel: 0/1 membership matrix B (shingle-run x source) in row
    chunks; C = B^T @ B accumulates ALL pairwise co-occurrences at
    once, and diag(C) the per-source distinct counts — one BLAS call
    per chunk, no per-pair Python, no source-count cap (chunk rows
    < 2^24 keep the float32 matmul exact)."""
    if t.num_rows == 0 or t.num_columns == 0:
        return _PART_SCHEMA.empty_table()
    sh = t.column("sh").to_numpy(zero_copy_only=False).view(U64)
    src = t.column("doc_id").to_numpy(zero_copy_only=False).astype(I64)
    # dedup (sh, src): batches dedup internally but not across batches
    order = np.lexsort((src, sh))
    sh, src = sh[order], src[order]
    keep = np.empty(sh.shape[0], dtype=bool)
    keep[0] = True
    keep[1:] = (sh[1:] != sh[:-1]) | (src[1:] != src[:-1])
    sh, src = sh[keep], src[keep]
    new = np.empty(sh.shape[0], dtype=bool)
    new[0] = True
    new[1:] = sh[1:] != sh[:-1]
    run_id = np.cumsum(new) - 1
    n_runs = int(run_id[-1]) + 1
    C = np.zeros((n_src, n_src), dtype=np.int64)
    # size the chunk so B stays ~16 MB at ANY allowed source count (and
    # chunk rows < 2^24 keep the float32 matmul exact)
    chunk = max(1, (1 << 22) // max(n_src, 1))
    for r0 in range(0, n_runs, chunk):
        r1 = min(r0 + chunk, n_runs)
        # run_id is nondecreasing: the chunk's rows are one contiguous
        # slice (searchsorted, not an O(n) mask per chunk)
        lo_, hi_ = np.searchsorted(run_id, [r0, r1])
        B = np.zeros((r1 - r0, n_src), dtype=np.float32)
        B[run_id[lo_:hi_] - r0, src[lo_:hi_]] = 1.0
        C += (B.T @ B).astype(np.int64)
    iu = np.triu_indices(n_src)
    vals = C[iu]
    nz = vals > 0
    return pa.table(
        {
            "a": pa.array(iu[0][nz].astype(I64), pa.int64()),
            "b": pa.array(iu[1][nz].astype(I64), pa.int64()),
            "n": pa.array(vals[nz], pa.int64()),
        }
    )


def source_overlap(
    docs: Dataset,
    *,
    k: int = 5,
    source_col: str = "source",
) -> pa.Table:
    """docs(doc_id, text, source) -> all source pairs (src_a < src_b)
    with distinct-shingle set sizes, intersection size and exact
    Jaccard, ordered by (src_a, src_b)."""
    from raydedup.stages.dupngrams import _posting_batches
    from raydedup.stages.exchange import hash_exchange_apply

    sources = distinct_sources(docs, source_col)
    n_src = len(sources)
    if n_src > 4096:
        raise ValueError(
            f"source_overlap: {n_src} groups make an O(S^2)={n_src**2} "
            "output matrix; group by a coarser axis (registered domain, "
            "source) or pre-bucket"
        )
    src_lut = pa.array(sources, pa.large_string())

    def postings(t: pa.Table) -> pa.Table:
        srcs = pc.cast(pc.fill_null(t.column(source_col), ""), pa.large_string())
        code = pc.index_in(srcs, value_set=src_lut)  # vectorized source->idx
        tbl = pa.table(
            {
                "doc_id": pc.cast(code, pa.int64()),
                "text": t.column("text"),
            }
        )
        return _posting_batches(tbl, k)

    parts = docs.select_columns(["text", source_col]).map_batches(
        postings, batch_format="pyarrow"
    )
    agg = hash_exchange_apply(parts, "sh", lambda b: _bucket_pair_partial(b, n_src))
    n_d = np.zeros(n_src, dtype=np.int64)
    n_c = np.zeros((n_src, n_src), dtype=np.int64)
    if agg.num_rows:
        a = agg.column("a").to_numpy(zero_copy_only=False)
        b = agg.column("b").to_numpy(zero_copy_only=False)
        n = agg.column("n").to_numpy(zero_copy_only=False)
        diag = a == b
        np.add.at(n_d, a[diag], n[diag])
        np.add.at(n_c, (a[~diag], b[~diag]), n[~diag])
    # vectorized S^2 assembly (8.4M pairs at the 4096-source cap would
    # take minutes as a Python loop)
    ii, jj = np.triu_indices(n_src, k=1)
    na, nb, nc = n_d[ii], n_d[jj], n_c[ii, jj]
    union = na + nb - nc
    jac = np.where(union > 0, nc / np.maximum(union, 1), 0.0)
    src_arr = pa.array(sources, pa.large_string())
    return pa.table(
        {
            "src_a": src_arr.take(pa.array(ii.astype(I64))),
            "src_b": src_arr.take(pa.array(jj.astype(I64))),
            "n_a": pa.array(na.astype(I64), pa.int64()),
            "n_b": pa.array(nb.astype(I64), pa.int64()),
            "n_common": pa.array(nc.astype(I64), pa.int64()),
            "jaccard": pa.array(jac, pa.float64()),
        },
        schema=OUT_SCHEMA,
    )


def source_clusters(
    docs: Dataset,
    *,
    k: int = 5,
    source_col: str = "source",
    tau_num: int = 1,
    tau_den: int = 50,
) -> pa.Table:
    """Group sources into mirror/syndication clusters: sources whose
    pairwise shingle-set Jaccard meets ``tau_num/tau_den`` (exact
    integer cross-multiplication: ``tau_den * n_common >= tau_num *
    union``) are merged transitively; each source reports its
    component's lexicographically-smallest member as ``cluster_rep``.

    The source-level analog of the flagship's doc clustering — read
    before choosing which mirrors to drop. The pairwise matrix is the
    ``source_overlap`` exchange output (O(S^2), driver-small by the
    same ≤4096 guard), so the union-find here is plain driver Python
    over a report-sized table, never over documents.
    """
    ov = source_overlap(docs, k=k, source_col=source_col)
    srcs = sorted(
        set(ov.column("src_a").to_pylist())
        | set(ov.column("src_b").to_pylist())
        | set(distinct_sources(docs, source_col))
    )
    parent = {s: s for s in srcs}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, na, nb, nc in zip(
        ov.column("src_a").to_pylist(),
        ov.column("src_b").to_pylist(),
        ov.column("n_a").to_pylist(),
        ov.column("n_b").to_pylist(),
        ov.column("n_common").to_pylist(),
    ):
        union = na + nb - nc
        if nc > 0 and tau_den * nc >= tau_num * union:
            ra, rb = find(a), find(b)
            if ra != rb:
                # keep the smaller string as root so rep = min member
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
    reps = {s: find(s) for s in srcs}
    return pa.table(
        {
            "source": pa.array(srcs, pa.large_string()),
            "cluster_rep": pa.array([reps[s] for s in srcs], pa.large_string()),
        }
    )
