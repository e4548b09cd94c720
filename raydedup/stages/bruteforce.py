"""Exact (brute-force) pairwise operators with SQL-checkable semantics.

These are the oracle-parity versions of the engine's verification
kernels (the ``panako same a b`` direct pair check, ``cli/Same.java:50-85``,
generalized to all-pairs): exact word-shingle Jaccard and exact
substring containment. They exist so the LSH/winnowing approximate
paths have a ground truth that DuckDB can reproduce, and they double as
the PCH-style "compare against everything" degenerate strategy
(``strategy/pch/PitchClassHistogramStrategy.java:149-217``).

Scale note: all-pairs is O(n^2) by definition — these run on bounded
inputs (oracle checks, `same` verb, small partitions). The scale paths
are candidates.py / containment.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from raydedup.config import DedupConfig
from raydedup.stages.signatures import shingle_hashes
from raydedup.stages.verify import jaccard_sorted


def jaccard_pairs_bruteforce(
    docs: Dataset, cfg: DedupConfig | None = None, min_jaccard: float = 0.2
) -> pd.DataFrame:
    """All-pairs exact word-5-gram Jaccard >= threshold.

    Shingle sets are computed distributed (map_batches), broadcast once
    via ray.put, and the O(n^2) pair matrix is row-partitioned across
    tasks (each task compares its doc slice against all later docs).
    Columns: a, b, n_inter, n_union, jaccard (raw IEEE division — no
    rounding, so DuckDB's 1.0*inter/union matches bit-for-bit).
    """
    cfg = cfg or DedupConfig()

    def sets_batch(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        sets = [shingle_hashes(x or "", cfg) for x in texts]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "shingles": pa.array([s.tobytes() for s in sets], type=pa.large_binary()),
            }
        )

    sig = docs.select_columns(["doc_id", "text"]).map_batches(
        sets_batch, batch_format="pyarrow"
    ).to_pandas()
    sig = sig.sort_values("doc_id").reset_index(drop=True)
    ids = sig["doc_id"].to_numpy().astype(np.int64)
    sets = [np.frombuffer(b, dtype=np.uint64) for b in sig["shingles"]]
    sets_ref = ray.put(sets)
    ids_ref = ray.put(ids)
    n = len(ids)

    @ray.remote
    def row_block(lo: int, hi: int, thr: float):
        all_sets = ray.get(sets_ref)
        all_ids = ray.get(ids_ref)
        rows = {"a": [], "b": [], "n_inter": [], "n_union": [], "jaccard": []}
        for i in range(lo, hi):
            si = all_sets[i]
            for j in range(i + 1, len(all_ids)):
                sj = all_sets[j]
                inter = np.intersect1d(si, sj, assume_unique=True).shape[0]
                union = si.shape[0] + sj.shape[0] - inter
                jac = inter / union if union else 1.0
                if jac >= thr:
                    rows["a"].append(int(all_ids[i]))
                    rows["b"].append(int(all_ids[j]))
                    rows["n_inter"].append(inter)
                    rows["n_union"].append(union)
                    rows["jaccard"].append(jac)
        return pd.DataFrame(rows)

    step = max(8, n // 32)
    futs = [row_block.remote(lo, min(lo + step, n), min_jaccard) for lo in range(0, n, step)]
    parts = [p for p in ray.get(futs) if len(p)]
    if not parts:
        return pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "n_inter": pd.Series(dtype="int64"), "n_union": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}
        )
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(["a", "b"]).reset_index(drop=True).astype(
        {"a": "int64", "b": "int64", "n_inter": "int64", "n_union": "int64"}
    )


def containment_pairs_exact(docs: Dataset) -> pd.DataFrame:
    """Exact substring containment: (a, b) where a.text is a proper
    substring of b.text (len(a) < len(b)).

    Candidates come from the winnowed fingerprint index (w=24, s=8:
    guarantee covers any contained doc >= 31 chars); each candidate is
    verified by an exact `in` check against broadcast texts. Matches
    DuckDB `position(a.text in b.text) > 0 AND length(a)<length(b)`.
    """
    cfg = DedupConfig(containment_window=24, containment_stride=8,
                      containment_max_postings=10_000, containment_min_coverage=0.0)
    tbl = docs.select_columns(["doc_id", "text"]).to_pandas()
    texts = dict(zip(tbl["doc_id"].astype(np.int64), tbl["text"]))
    texts_ref = ray.put(texts)

    from raydedup.stages.containment import containment_pairs

    cand = containment_pairs(docs, cfg).select_columns(["a", "b"])

    def verify(t: pa.Table) -> pa.Table:
        tx = ray.get(texts_ref)
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        out_a, out_b = [], []
        for i in range(a.shape[0]):
            ta, tb = tx[int(a[i])], tx[int(b[i])]
            if len(ta) < len(tb) and ta in tb:
                out_a.append(int(a[i])); out_b.append(int(b[i]))
            elif len(tb) < len(ta) and tb in ta:
                out_a.append(int(b[i])); out_b.append(int(a[i]))
        return pa.table({"a": pa.array(out_a, pa.int64()), "b": pa.array(out_b, pa.int64())})

    ver = cand.map_batches(verify, batch_format="pyarrow").to_pandas()
    if ver.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    return ver.drop_duplicates().sort_values(["a", "b"]).reset_index(drop=True)


def same_check(text_a: str, text_b: str, cfg: DedupConfig | None = None) -> dict:
    """Direct two-doc check (the `panako same` verb, ``cli/Same.java:50-85``):
    exact Jaccard + containment coverage of the pair."""
    cfg = cfg or DedupConfig()
    sa = shingle_hashes(text_a, cfg)
    sb = shingle_hashes(text_b, cfg)
    inter = np.intersect1d(sa, sb, assume_unique=True).shape[0]
    union = sa.shape[0] + sb.shape[0] - inter
    return {
        "jaccard": inter / union if union else 1.0,
        "containment": inter / max(1, min(sa.shape[0], sb.shape[0])),
        "is_near_dup": bool(union and inter / union >= cfg.jaccard_tau),
        "n_shingles_a": int(sa.shape[0]),
        "n_shingles_b": int(sb.shape[0]),
    }
