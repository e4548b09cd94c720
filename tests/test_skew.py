"""Skew / pair-explosion stress tests (the north rule's explicit
requirement; the reference just walks long duplicate chains,
``PanakoStorageKV.java:335-370``)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raydedup.config import DedupConfig
from raydedup.stages.candidates import band_postings, band_size_stats, postings_to_pairs
from raydedup.stages.extract import docs_identity_batch
from raydedup.pipelines.dedup import compute_signatures, run_dedup


def _docs_ds(rd, texts):
    t = pa.table(
        {"doc_id": pa.array(list(range(len(texts))), pa.int64()), "text": texts}
    )
    return rd.from_arrow(t).map_batches(docs_identity_batch, batch_format="pyarrow")


def test_degenerate_band_capped(ray_session):
    """2000 DISTINCT near-identical docs share most bands; with a low cap
    those bands are dropped and counted rather than emitting ~2M pairs."""
    import ray.data as rd

    base = " ".join(f"w{i}" for i in range(60))
    texts = [base + f" tail{i}" for i in range(2000)]  # 2000 distinct variants
    docs = _docs_ds(rd, texts)
    cfg = DedupConfig(batch_size=512, max_band_postings=100)
    sigs = compute_signatures(docs, cfg, keep_shingles=False).materialize()
    post = band_postings(sigs, cfg)
    stats = band_size_stats(post, cfg)
    assert stats["dropped_groups"] > 0
    assert stats["max_group"] >= 100
    pairs = postings_to_pairs(post, cfg).to_pandas()
    # all surviving groups obey the cap: no group contributes > cap^2 pairs
    assert len(pairs) < 2000 * 100


def test_exact_copies_do_not_trip_band_cap(ray_session):
    """ADVICE r1: the run-size cap counts DISTINCT signatures, so a text
    with far more byte-identical copies than max_band_postings must keep
    its near-dup edge (the copies are one signature, not 1500)."""
    import ray.data as rd

    base_words = [f"tok{i}" for i in range(64)]
    base = " ".join(base_words)
    neardup = " ".join(base_words[:60] + ["zz1", "zz2", "zz3", "zz4"])
    texts = [base] * 1500 + [neardup]
    docs = _docs_ds(rd, texts)
    cfg = DedupConfig(batch_size=512, max_band_postings=100)
    sigs = compute_signatures(docs, cfg, keep_shingles=False).materialize()
    pairs = postings_to_pairs(band_postings(sigs, cfg), cfg).to_pandas()
    # the near-dup doc (id 1500) must be a candidate against rep doc 0
    assert ((pairs["a"] == 0) & (pairs["b"] == 1500)).any()
    # and the copies connect to the rep via linear star edges, not O(n^2)
    assert len(pairs) <= 1500 + 10
    res = run_dedup(docs, cfg)
    cl = res.clusters.to_pandas()
    assert cl.cluster_id.nunique() == 1  # everything one cluster


def test_large_exact_group_stays_cheap_and_correct(ray_session):
    """A 300-copy exact group must cluster fully via sha edges without
    LSH pair explosion (members are filtered from candidates)."""
    import ray.data as rd

    base = " ".join(f"tok{i}" for i in range(80))
    uniq = [" ".join(f"u{i}_{j}" for j in range(40)) for i in range(50)]
    texts = [base] * 300 + uniq
    docs = _docs_ds(rd, texts)
    res = run_dedup(docs, DedupConfig(batch_size=512))
    cl = res.clusters.to_pandas()
    copies = cl[cl.doc_id < 300]
    assert copies.cluster_id.nunique() == 1
    assert res.metrics["exact_edges"] == 299
    # candidate pairs exclude exact members -> no quadratic blowup
    assert res.metrics["candidate_pairs"] < 1000
    singles = cl[cl.doc_id >= 300]
    assert (singles.doc_id == singles.cluster_id).all()


def test_hash_exchange_join_completeness(ray_session):
    """Every (left, right) key match lands in exactly one bucket kernel."""
    import ray
    import ray.data as rd

    from raydedup.stages.exchange import hash_exchange_join

    rng = np.random.Generator(np.random.PCG64(3))
    lk = rng.integers(0, 200, size=5000, dtype=np.int64)
    rk = np.arange(200, dtype=np.int64)
    left = rd.from_arrow(
        pa.table({"k": pa.array(lk), "v": pa.array(np.arange(5000, dtype=np.int64))})
    ).repartition(5)
    right = rd.from_arrow(
        pa.table({"k2": pa.array(rk), "w": pa.array(rk * 10)})
    ).repartition(3)

    def kernel(lt: pa.Table, rt: pa.Table) -> pa.Table:
        lookup = dict(zip(rt.column("k2").to_pylist(), rt.column("w").to_pylist()))
        ks = lt.column("k").to_pylist()
        return pa.table(
            {
                "k": lt.column("k"),
                "v": lt.column("v"),
                "w": pa.array([lookup[k] for k in ks], type=pa.int64()),
            }
        )

    refs = hash_exchange_join(left, right, "k", "k2", kernel, num_buckets=16)
    parts = [t for t in ray.get(refs) if t.num_rows]
    got = pa.concat_tables(parts).to_pandas().sort_values("v").reset_index(drop=True)
    assert len(got) == 5000
    assert (got["w"] == got["k"] * 10).all()


def test_evaluate_against_oracle_helper(ray_session, small_corpus):
    from raydedup.metrics import evaluate_against_oracle
    from raydedup.sources.pages import pages_to_docs, read_pages

    spec, paths = small_corpus
    res = run_dedup(
        pages_to_docs(read_pages(paths["pages"])), DedupConfig(batch_size=256), containment=True
    )
    report = evaluate_against_oracle(
        res.clusters.to_pandas(), paths["oracle_clusters"], paths["oracle_pairs"]
    )
    assert report["recall"] >= 0.99
    assert report["boilerplate_false_merges"] == 0
    assert report["broken_singletons"] == 0


def test_simhash_secondary_matcher_catches_reordered_dups(ray_session):
    """A5 fallback gate: token-REORDERED copies (bag-of-words identical,
    word-5-gram shingle sets ~disjoint) are invisible to MinHash+Jaccard
    but Hamming-0 in SimHash; use_simhash=True must co-cluster them and
    use_simhash=False must not (the primary matcher alone under-scores)."""
    import ray.data as rd

    rng = np.random.default_rng(17)
    words = [f"tok{i}" for i in range(120)]
    base = " ".join(words)
    reordered = " ".join(rng.permutation(words).tolist())
    uniq = [" ".join(f"u{i}_{j}" for j in range(40)) for i in range(30)]
    texts = [base, reordered] + uniq
    docs = _docs_ds(rd, texts)

    off = run_dedup(docs, DedupConfig(batch_size=64), use_simhash=False)
    cl_off = off.clusters.to_pandas().set_index("doc_id").cluster_id
    assert cl_off[0] != cl_off[1]

    on = run_dedup(docs, DedupConfig(batch_size=64), use_simhash=True)
    cl_on = on.clusters.to_pandas().set_index("doc_id").cluster_id
    assert cl_on[0] == cl_on[1]
    assert on.metrics.get("simhash_accepted", 0) >= 1
    # unrelated docs stay singletons under the secondary matcher
    assert cl_on[range(2, 32)].nunique() == 30


def test_recover_hot_runs_restores_dropped_recall(ray_session):
    """VERDICT r3 #7 (SURVEY §4 salting): a genuine near-dup family
    whose band runs exceed the distinct-signature cap is DROPPED by the
    default policy (recall 0 on those pairs) but RECOVERED with
    cfg.recover_hot_runs — sub-group cliques + a replicated anchor rep
    keep the pair fan-out O(reps x hot_run_group) while the family
    co-clusters after verification."""
    import ray.data as rd

    base = " ".join(f"w{i}" for i in range(120))
    # 24 distinct variants, pairwise jaccard well above tau (one token
    # appended out of ~116 5-gram shingles)
    texts = [base + f" v{i}" for i in range(24)]
    uniq = [" ".join(f"u{i}_{j}" for j in range(40)) for i in range(20)]
    docs = _docs_ds(rd, texts + uniq)

    dropped_cfg = DedupConfig(batch_size=64, max_band_postings=8)
    res_off = run_dedup(docs, dropped_cfg)
    cl_off = res_off.clusters.to_pandas().set_index("doc_id").cluster_id
    # default policy: the hot runs are dropped, family stays split
    assert cl_off[range(24)].nunique() > 1

    rec_cfg = DedupConfig(
        batch_size=64, max_band_postings=8, recover_hot_runs=True, hot_run_group=4
    )
    res_on = run_dedup(docs, rec_cfg)
    cl_on = res_on.clusters.to_pandas().set_index("doc_id").cluster_id
    assert cl_on[range(24)].nunique() == 1  # full family recovered
    # bounded fan-out: nowhere near the 24^2/2 all-pairs volume per run
    assert res_on.metrics["candidate_pairs"] < 24 * 16
    # unrelated docs unaffected
    assert cl_on[range(24, 44)].nunique() == 20
