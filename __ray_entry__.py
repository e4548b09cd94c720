"""Driver contract for the raydedup engine (Ray Data target).

The driver calls ``ray.init`` itself, then ``entry()`` as a smoke check,
then each ``queries()[name](sf_dir)`` at sf=0.01 comparing against
``oracle_sql()[name]`` via DuckDB (row count + schema + order-insensitive
value hash). Nothing here calls ray.init/ray.shutdown.

Query names map to SURVEY.md §2 operators; see each callable's docstring.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _docs(sf_dir: str):
    from raydedup.sources.pages import read_docs

    return read_docs(sf_dir)


def _read(sf_dir: str, table: str):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"))


def entry() -> Any:
    """Flagship pipeline: full near-dup detection + clustering (with
    containment pass) over the sf0.001 documents table."""
    from raydedup.config import DedupConfig
    from raydedup.pipelines.dedup import run_dedup

    docs = _docs("/root/testdata/sf0.001")
    res = run_dedup(docs, DedupConfig(batch_size=1024), containment=True)
    return res.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_dedup_pipeline(sf_dir: str):
    """D2/J1/A1-A4: full LSH dedup pipeline -> cluster assignments."""
    from raydedup.config import DedupConfig
    from raydedup.pipelines.dedup import run_dedup

    res = run_dedup(_docs(sf_dir), DedupConfig(batch_size=1024), containment=True)
    return res.clusters.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_exact_dup_pairs(sf_dir: str):
    """D1: exact dedup pairs (rep=min doc_id per identical text, member)."""
    from raydedup.pipelines.dedup import exact_dedup_edges
    from raydedup.util import to_arrow_table

    tbl = to_arrow_table(
        exact_dedup_edges(_docs(sf_dir)),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]),
    )
    return tbl.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)


def _q_doc_stats_by_lang(sf_dir: str):
    """A6 stats: per-lang doc counts + text length min/mean/max."""
    from raydedup.stages.textstats import doc_stats

    df = doc_stats(_read(sf_dir, "documents"), by="lang").to_pandas()
    return df.sort_values("lang").reset_index(drop=True)


def _q_token_counts(sf_dir: str):
    """Text analysis: whitespace token counts per doc."""
    from raydedup.stages.textstats import token_count_batch

    ds = _read(sf_dir, "documents").map_batches(
        lambda t: token_count_batch(t).select(["doc_id", "n_tokens"]),
        batch_format="pyarrow",
    )
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_quality_scores(sf_dir: str):
    """Text analysis: punctuation/digit ratios + mean word length."""
    from raydedup.stages.textstats import quality_score_batch

    ds = _read(sf_dir, "documents").map_batches(
        lambda t: quality_score_batch(t).select(
            ["doc_id", "mean_word_len", "punct_ratio", "digit_ratio"]
        ),
        batch_format="pyarrow",
    )
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_jaccard_pairs(sf_dir: str):
    """J4/A7: all-pairs exact word-5-gram Jaccard >= 0.2 (brute force)."""
    from raydedup.stages.bruteforce import jaccard_pairs_bruteforce

    return jaccard_pairs_bruteforce(_docs(sf_dir), min_jaccard=0.2)


def _q_containment_pairs(sf_dir: str):
    """W1 containment: docs whose text is a proper substring of another."""
    from raydedup.stages.bruteforce import containment_pairs_exact

    return containment_pairs_exact(_docs(sf_dir))


def _q_knn_cosine(sf_dir: str):
    """ANN baseline: exact top-10 cosine vs the vec_id=0 embedding."""
    from raydedup.stages.ann import knn_cosine_bruteforce

    emb = _read(sf_dir, "embeddings")
    q = np.asarray(emb.limit(1).to_pandas()["embedding"][0], dtype=np.float32)
    df = knn_cosine_bruteforce(emb, q, k=10)
    return df[["vec_id", "cosine"]]


def _q_embedding_neardup(sf_dir: str):
    """Embedding-cosine near-dup pairs >= 0.4 (exact all-pairs baseline)."""
    from raydedup.stages.ann import embedding_neardup_bruteforce

    emb = _read(sf_dir, "embeddings")
    return embedding_neardup_bruteforce(emb, threshold=0.4)[["a", "b", "cosine"]]


def _q_embedding_neardup_bucketed(sf_dir: str):
    """Scale path: centroid-bucketed near-dup pairs (approximate —
    cross-bucket pairs at low thresholds are the documented loss)."""
    from raydedup.stages.ann import embedding_neardup_pairs

    emb = _read(sf_dir, "embeddings")
    return embedding_neardup_pairs(emb, threshold=0.4, n_centroids=8)[["a", "b", "cosine"]]


def _q_events_hourly(sf_dir: str):
    """W1 windowing: per-user hourly tumbling windows (count + exact
    cent-sums — float sums are order-dependent, cents are not)."""
    from raydedup.stages.windows import tumbling_window_agg

    ev = _read(sf_dir, "events")

    def to_cents(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return t.set_column(
            t.schema.get_field_index("value"),
            "value",
            pa.array(np.rint(v * 100).astype(np.int64), type=pa.int64()),
        )

    ev = ev.map_batches(to_cents, batch_format="pyarrow")
    df = tumbling_window_agg(ev, window_s=3600).to_pandas()
    df = df[["user_id", "window_start", "n_events", "sum_value", "max_value", "min_value"]]
    return df.sort_values(["user_id", "window_start"]).reset_index(drop=True)


def _q_top_docs_by_len(sf_dir: str):
    """K3 top-k: 20 longest docs (deterministic doc_id tiebreak)."""
    import ray.data as rd
    from raydedup.stages.textstats import token_count_batch

    ds = _read(sf_dir, "documents").map_batches(
        lambda t: t.append_column(
            "text_len", pc.cast(pc.utf8_length(t["text"]), pa.int64())
        ).select(["doc_id", "text_len"]),
        batch_format="pyarrow",
    )
    df = ds.to_pandas()
    df = df.sort_values(["text_len", "doc_id"], ascending=[False, True], kind="mergesort")
    return df.head(20).reset_index(drop=True)


def _q_lang_distribution(sf_dir: str):
    """A6: doc counts by lang column."""
    from ray.data.aggregate import Count

    df = (
        _read(sf_dir, "documents")
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )
    return df.sort_values("lang").reset_index(drop=True)


def _q_shingle_counts(sf_dir: str):
    """M4 analog: distinct word-5-gram shingle count per doc (docs with
    >= 5 tokens; mirrors the SQL lead()-window shingling)."""
    from raydedup.config import DedupConfig
    from raydedup.stages.signatures import shingle_hashes, tokenize

    cfg = DedupConfig()

    def counts(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        keep, n_sh = [], []
        for i, x in enumerate(texts):
            if len(tokenize(x or "")) >= cfg.shingle_k:
                keep.append(int(ids[i]))
                n_sh.append(int(shingle_hashes(x, cfg).shape[0]))
        return pa.table(
            {"doc_id": pa.array(keep, pa.int64()), "n_shingles": pa.array(n_sh, pa.int64())}
        )

    df = (
        _read(sf_dir, "documents")
        .map_batches(counts, batch_format="pyarrow")
        .to_pandas()
    )
    return df.sort_values("doc_id").reset_index(drop=True)


def _q_events_type_stats(sf_dir: str):
    """A6: per-event-type counts + exact cent-sums + min/max value."""
    from ray.data.aggregate import Count, Max, Min, Sum

    ev = _read(sf_dir, "events")

    def to_cents(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "cents": pa.array(np.rint(v * 100).astype(np.int64), type=pa.int64()),
            }
        )

    df = (
        ev.map_batches(to_cents, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("cents", alias_name="sum_cents"),
            Min("cents", alias_name="min_cents"),
            Max("cents", alias_name="max_cents"),
        )
        .to_pandas()
    )
    return df.sort_values("event_type").reset_index(drop=True)


def _q_top_users_by_value(sf_dir: str):
    """K3: top-10 users by total event value (cents)."""
    from ray.data.aggregate import Sum

    ev = _read(sf_dir, "events")

    def to_cents(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "cents": pa.array(np.rint(v * 100).astype(np.int64), type=pa.int64()),
            }
        )

    df = (
        ev.map_batches(to_cents, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("cents", alias_name="sum_cents"))
        .to_pandas()
    )
    df = df.sort_values(["sum_cents", "user_id"], ascending=[False, True], kind="mergesort")
    return df.head(10).reset_index(drop=True)


def _q_dedup_rate(sf_dir: str):
    """A6: corpus-level dedup stats (docs, distinct texts, dup rate)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    docs = _read(sf_dir, "documents")
    n = docs.count()
    distinct = docs.map_batches(
        lambda t: t.select(["text"]), batch_format="pyarrow"
    ).unique("text")
    n_distinct = len(distinct)
    return pd.DataFrame(
        {
            "n_docs": pd.Series([n], dtype="int64"),
            "n_distinct_texts": pd.Series([n_distinct], dtype="int64"),
            "dup_rate": [float(n - n_distinct) / n if n else 0.0],
        }
    )


# --- rows-only (non-SQL-expressible) ---------------------------------------


def _q_lineitem_agg(sf_dir: str):
    """Relational surface (A6/K): grouped lineitem aggregate with a
    date filter — filter + groupby + exact integer aggregates."""
    from ray.data.aggregate import Count, Max, Sum

    li = _read(sf_dir, "lineitem")
    cutoff = np.datetime64("1998-09-01T00:00:00", "us").astype("int64")

    def prep(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = ship <= cutoff
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "l_linestatus": t.column("l_linestatus"),
                "qty": pa.array(np.rint(qty).astype(np.int64), type=pa.int64()),
                "price_cents": pa.array(
                    np.rint(price * 100).astype(np.int64), type=pa.int64()
                ),
            }
        ).filter(pa.array(keep))

    df = (
        li.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Max("qty", alias_name="max_qty"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    return df.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def _q_orders_by_segment(sf_dir: str):
    """Relational join (J2 analog): orders x customer grouped by market
    segment — Dataset.join + groupby with exact integer sums."""
    from ray.data.aggregate import Count, Sum

    orders = _read(sf_dir, "orders").select_columns(["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "price_cents": pa.array(np.rint(v * 100).astype(np.int64), type=pa.int64()),
            }
        )

    orders = orders.map_batches(cents, batch_format="pyarrow")
    cust = _read(sf_dir, "customer").select_columns(["c_custkey", "c_mktsegment"])
    joined = orders.join(
        cust, join_type="inner", num_partitions=4, on=("o_custkey",), right_on=("c_custkey",)
    )
    df = (
        joined.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("price_cents", alias_name="sum_price_cents"))
        .to_pandas()
    )
    return df.sort_values("c_mktsegment").reset_index(drop=True)


def _q_top_customers(sf_dir: str):
    """K3 top-k over a join: top-10 customers by total order value."""
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders").select_columns(["o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        v = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_custkey": t.column("o_custkey"),
                "price_cents": pa.array(np.rint(v * 100).astype(np.int64), type=pa.int64()),
            }
        )

    totals = (
        orders.map_batches(cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("price_cents", alias_name="sum_price_cents"))
        .to_pandas()
    )
    totals = totals.sort_values(
        ["sum_price_cents", "o_custkey"], ascending=[False, True], kind="mergesort"
    ).head(10)
    cust = _read(sf_dir, "customer").select_columns(["c_custkey", "c_name"]).to_pandas()
    out = totals.merge(cust, left_on="o_custkey", right_on="c_custkey")[
        ["o_custkey", "c_name", "sum_price_cents"]
    ]
    return out.reset_index(drop=True)


def _q_minhash_signatures(sf_dir: str):
    """M1-M5: signature table (doc_id, simhash, n_shingles)."""
    from raydedup.config import DedupConfig
    from raydedup.pipelines.dedup import compute_signatures

    sig = compute_signatures(_docs(sf_dir), DedupConfig(batch_size=1024), keep_shingles=False)
    df = sig.select_columns(["doc_id", "simhash", "n_shingles"]).to_pandas()
    df["simhash"] = df["simhash"].astype(np.uint64).astype(np.int64)
    return df.sort_values("doc_id").reset_index(drop=True)


def _q_lsh_candidates(sf_dir: str):
    """J1: LSH band-collision candidate pairs with collision counts."""
    from raydedup.config import DedupConfig
    from raydedup.pipelines.dedup import compute_signatures
    from raydedup.stages.candidates import band_postings, postings_to_pairs

    cfg = DedupConfig(batch_size=1024)
    sig = compute_signatures(_docs(sf_dir), cfg, keep_shingles=False).materialize()
    pairs = postings_to_pairs(band_postings(sig, cfg), cfg).to_pandas()
    return pairs.sort_values(["a", "b"]).reset_index(drop=True)


def _q_simhash_pairs(sf_dir: str):
    """A5 fallback matcher: SimHash pairs within Hamming <= 3 (pigeonhole
    block candidates + exact Hamming verify)."""
    from raydedup.config import DedupConfig
    from raydedup.pipelines.dedup import compute_signatures
    from raydedup.stages.candidates import postings_to_pairs, simhash_postings
    from raydedup.stages.signatures import hamming64
    import ray

    cfg = DedupConfig(batch_size=1024)
    sig = compute_signatures(_docs(sf_dir), cfg, keep_shingles=False).materialize()
    cand = postings_to_pairs(simhash_postings(sig, cfg), cfg).to_pandas()
    sim_map = dict(
        zip(
            sig.select_columns(["doc_id"]).to_pandas()["doc_id"],
            sig.select_columns(["simhash"]).to_pandas()["simhash"].astype(np.uint64),
        )
    )
    if cand.empty:
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "hamming": pd.Series(dtype="int64")})
    av = np.array([sim_map[x] for x in cand["a"]], dtype=np.uint64)
    bv = np.array([sim_map[x] for x in cand["b"]], dtype=np.uint64)
    cand["hamming"] = hamming64(av, bv).astype(np.int64)
    out = cand[cand["hamming"] <= cfg.simhash_max_hamming][["a", "b", "hamming"]]
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _q_lang_id(sf_dir: str):
    """Text analysis: heuristic language ID (actor-pool stage)."""
    from raydedup.stages.textstats import LangIdKernel

    ds = _read(sf_dir, "documents").map_batches(
        LangIdKernel, batch_format="pyarrow", concurrency=2
    )
    df = ds.select_columns(["doc_id", "lang_pred"]).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def _q_doc_fingerprints(sf_dir: str):
    """M6/M7: content hash + rolling fingerprint per doc."""
    from raydedup.stages.textstats import doc_fingerprint_batch

    ds = _read(sf_dir, "documents").map_batches(
        lambda t: doc_fingerprint_batch(t).select(["doc_id", "text_hash", "rolling_fp"]),
        batch_format="pyarrow",
    )
    return ds.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _q_knn_cosine_ivf(sf_dir: str):
    """ANN scale path: IVF-bucketed top-10 cosine (approximate)."""
    from raydedup.stages.ann import knn_cosine_ivf

    emb = _read(sf_dir, "embeddings")
    q = np.asarray(emb.limit(1).to_pandas()["embedding"][0], dtype=np.float32)
    return knn_cosine_ivf(emb, q, k=10, n_centroids=8, n_probe=4)[["vec_id", "cosine"]]


def _q_knn_cosine_lsh(sf_dir: str):
    """ANN scale path 2: random-hyperplane LSH buckets (approximate)."""
    from raydedup.stages.ann import knn_cosine_lsh

    emb = _read(sf_dir, "embeddings")
    q = np.asarray(emb.limit(1).to_pandas()["embedding"][0], dtype=np.float32)
    return knn_cosine_lsh(emb, q, k=10)[["vec_id", "cosine"]]


def _q_store_query(sf_dir: str):
    """S3/J1-J2 store+query lifecycle: index the documents table, query
    the first 50 docs against it; every query doc must find a perfect
    match (itself)."""
    import glob
    import tempfile

    import ray.data as rd

    from raydedup.pipelines.query import query_index
    from raydedup.pipelines.dedup import compute_signatures
    from raydedup.config import DedupConfig
    from raydedup.state.checkpoint import CheckpointManager, _atomic_write_table
    from raydedup.util import to_arrow_table

    cfg = DedupConfig(batch_size=1024)
    import hashlib

    # stable digest (NOT the salted builtin hash): the same sf_dir must
    # map to the same index dir across processes so shard_done reuse works
    sf_tag = hashlib.sha256(sf_dir.encode()).hexdigest()[:8]
    idx = os.path.join(tempfile.gettempdir(), f"rayentry_idx_{sf_tag}")
    mgr = CheckpointManager(idx, cfg)
    if not mgr.shard_done("docs:0"):
        docs = _docs(sf_dir).materialize()
        sig = compute_signatures(docs, cfg, keep_shingles=False)
        _atomic_write_table(
            to_arrow_table(docs.map_batches(
                lambda t: t.append_column("url", t.column("source")) if "url" not in t.column_names else t,
                batch_format="pyarrow")),
            mgr.path("docs", "shard=00000.parquet"),
        )
        _atomic_write_table(to_arrow_table(sig), mgr.path("signatures", "shard=00000.parquet"))
        mgr.mark_shard("docs:0", shard=0)
    q = _docs(sf_dir).limit(50)
    df = query_index(idx, q, top_k=3)
    df = df[["query_doc_id", "match_doc_id", "n_collisions", "rank"]]
    return df.sort_values(["query_doc_id", "rank"]).reset_index(drop=True)


def _q_containment_winnowed(sf_dir: str):
    """W1 scale path: winnowed containment candidates with coverage."""
    from raydedup.config import DedupConfig
    from raydedup.stages.containment import containment_pairs

    df = containment_pairs(_docs(sf_dir), DedupConfig()).to_pandas()
    return df.sort_values(["a", "b"]).reset_index(drop=True)


def _q_sliding_windows(sf_dir: str):
    """W1: sliding windows (1 h window / 15 min step) per user."""
    from raydedup.stages.windows import sliding_window_agg

    ev = _read(sf_dir, "events")

    def to_cents(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        return t.set_column(
            t.schema.get_field_index("value"),
            "value",
            pa.array(np.rint(v * 100).astype(np.int64), type=pa.int64()),
        )

    ev = ev.map_batches(to_cents, batch_format="pyarrow")
    df = sliding_window_agg(ev, window_s=3600, step_s=900).to_pandas()
    df = df[["user_id", "window_start", "n_events", "sum_value"]]
    return df.sort_values(["user_id", "window_start"]).reset_index(drop=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "dedup_pipeline": _q_dedup_pipeline,
        "exact_dup_pairs": _q_exact_dup_pairs,
        "doc_stats_by_lang": _q_doc_stats_by_lang,
        "token_counts": _q_token_counts,
        "quality_scores": _q_quality_scores,
        "jaccard_pairs": _q_jaccard_pairs,
        "containment_pairs": _q_containment_pairs,
        "knn_cosine": _q_knn_cosine,
        "embedding_neardup": _q_embedding_neardup,
        "events_hourly": _q_events_hourly,
        "top_docs_by_len": _q_top_docs_by_len,
        "lang_distribution": _q_lang_distribution,
        "shingle_counts": _q_shingle_counts,
        "events_type_stats": _q_events_type_stats,
        "top_users_by_value": _q_top_users_by_value,
        "dedup_rate": _q_dedup_rate,
        "lineitem_agg": _q_lineitem_agg,
        "orders_by_segment": _q_orders_by_segment,
        "top_customers": _q_top_customers,
        # rows-only
        "minhash_signatures": _q_minhash_signatures,
        "lsh_candidates": _q_lsh_candidates,
        "simhash_pairs": _q_simhash_pairs,
        "lang_id": _q_lang_id,
        "doc_fingerprints": _q_doc_fingerprints,
        "knn_cosine_ivf": _q_knn_cosine_ivf,
        "knn_cosine_lsh": _q_knn_cosine_lsh,
        "store_query": _q_store_query,
        "embedding_neardup_bucketed": _q_embedding_neardup_bucketed,
        "containment_winnowed": _q_containment_winnowed,
        "sliding_windows": _q_sliding_windows,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB over the same parquet views)
# ---------------------------------------------------------------------------

_SHINGLES_CTE = """
WITH toks AS (
  SELECT doc_id, w,
         row_number() OVER (PARTITION BY doc_id ORDER BY pos) rn
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w,
               generate_subscripts(string_split_regex(trim(lower(text)), '\\s+'), 1) AS pos
        FROM documents)
), sh AS (
  SELECT DISTINCT doc_id,
         w || ' ' || lead(w,1) OVER win || ' ' || lead(w,2) OVER win || ' '
           || lead(w,3) OVER win || ' ' || lead(w,4) OVER win AS shingle
  FROM toks WINDOW win AS (PARTITION BY doc_id ORDER BY rn)
  QUALIFY lead(w,4) OVER win IS NOT NULL
)
"""


def oracle_sql() -> dict[str, str]:
    return {
        "exact_dup_pairs": """
            SELECT CAST(min(doc_id) OVER (PARTITION BY text) AS BIGINT) AS a,
                   CAST(doc_id AS BIGINT) AS b
            FROM documents
            QUALIFY count(*) OVER (PARTITION BY text) >= 2
                AND doc_id != min(doc_id) OVER (PARTITION BY text)
            ORDER BY a, b
        """,
        "doc_stats_by_lang": """
            SELECT lang,
                   count(*) AS n_docs,
                   avg(length(text)) AS avg_len,
                   CAST(min(length(text)) AS BIGINT) AS min_len,
                   CAST(max(length(text)) AS BIGINT) AS max_len
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "token_counts": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens
            FROM documents ORDER BY doc_id
        """,
        "quality_scores": """
            SELECT doc_id,
                   CASE WHEN length(trim(text)) = 0 THEN 0.0
                        ELSE (length(text) - greatest(len(string_split_regex(trim(text), '\\s+')) - 1, 0))
                             * 1.0 / greatest(len(string_split_regex(trim(text), '\\s+')), 1) END
                     AS mean_word_len,
                   length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / greatest(length(text), 1) AS punct_ratio,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / greatest(length(text), 1) AS digit_ratio
            FROM documents ORDER BY doc_id
        """,
        "jaccard_pairs": _SHINGLES_CTE
        + """
        , sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS ad, b.doc_id AS bd, count(*) AS ni
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT ad AS a, bd AS b,
               CAST(ni AS BIGINT) AS n_inter,
               CAST(sa.n + sb.n - ni AS BIGINT) AS n_union,
               ni * 1.0 / (sa.n + sb.n - ni) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = ad
        JOIN sizes sb ON sb.doc_id = bd
        WHERE ni * 1.0 / (sa.n + sb.n - ni) >= 0.2
        ORDER BY a, b
        """,
        "containment_pairs": """
            SELECT a.doc_id AS a, b.doc_id AS b
            FROM documents a JOIN documents b
              ON a.doc_id != b.doc_id
             AND length(a.text) < length(b.text)
             AND position(a.text in b.text) > 0
            ORDER BY a, b
        """,
        "knn_cosine": """
            SELECT b.vec_id,
                   list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cosine
            FROM embeddings a CROSS JOIN embeddings b
            WHERE a.vec_id = (SELECT min(vec_id) FROM embeddings)
            ORDER BY cosine DESC, b.vec_id ASC
            LIMIT 10
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cosine
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
            ORDER BY a, b
        """,
        "events_hourly": """
            SELECT user_id,
                   date_trunc('hour', ts) AS window_start,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value,
                   CAST(max(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS max_value,
                   CAST(min(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS min_value
            FROM events GROUP BY 1, 2 ORDER BY user_id, window_start
        """,
        "top_docs_by_len": """
            SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len
            FROM documents ORDER BY text_len DESC, doc_id ASC LIMIT 20
        """,
        "lang_distribution": """
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang ORDER BY lang
        """,
        "shingle_counts": _SHINGLES_CTE
        + """
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
        FROM sh GROUP BY doc_id ORDER BY doc_id
        """,
        "events_type_stats": """
            SELECT event_type,
                   count(*) AS n_events,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
                   CAST(min(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS min_cents,
                   CAST(max(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS max_cents
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "top_users_by_value": """
            SELECT user_id,
                   CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
            FROM events GROUP BY user_id
            ORDER BY sum_cents DESC, user_id ASC LIMIT 10
        """,
        "lineitem_agg": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   CAST(max(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS max_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "orders_by_segment": """
            SELECT c.c_mktsegment,
                   count(*) AS n_orders,
                   CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                     AS sum_price_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
        """,
        "top_customers": """
            SELECT o.o_custkey,
                   any_value(c.c_name) AS c_name,
                   CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                     AS sum_price_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY o.o_custkey
            ORDER BY sum_price_cents DESC, o.o_custkey ASC LIMIT 10
        """,
        "sliding_windows": """
            WITH cents AS (
              SELECT user_id, ts, CAST(round(value*100,0) AS BIGINT) AS v FROM events
            ), win AS (
              SELECT c.user_id,
                     to_timestamp((floor(epoch(c.ts)/900) - g.g) * 900)::TIMESTAMP AS window_start,
                     c.v
              FROM cents c CROSS JOIN (SELECT unnest(range(0, 4)) AS g) g
              WHERE epoch(c.ts) < (floor(epoch(c.ts)/900) - g.g) * 900 + 3600
            )
            SELECT user_id, window_start,
                   count(*) AS n_events,
                   CAST(sum(v) AS BIGINT) AS sum_value
            FROM win GROUP BY 1, 2 ORDER BY user_id, window_start
        """,
        "dedup_rate": """
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
                   (count(*) - count(DISTINCT text)) * 1.0 / count(*) AS dup_rate
            FROM documents
        """,
    }
