"""Deterministic synthetic Common-Crawl-style corpus with planted duplicates.

Mirrors the reference's test-corpus design: Panako's e2e tests store a
few reference tracks and query filename-ground-truthed fragments
(``src/test/java/be/panako/tests/TestData.java:30-80``,
``PanakoStrategyTest.java:40-70``) with degraded variants
(``OlafStorageKVTest.java:128-137``). Here the ground truth is planted
directly: every generated page carries a hidden (group_id, variant)
recorded in oracle tables (see FIXTURES.md).

Schema (per BASELINE.json input_hint):
  pages(url: string, warc_ts: timestamp[us], html: binary, text: string,
        lang: string)
  oracle_clusters(url, group_id: uint64, variant: string)
  oracle_pairs(a_url, b_url, kind: string, jaccard_true: float32)

All randomness flows from one seed; the html is rendered so that
``extract_text_from_html(html) == text`` byte-identically.
"""

from __future__ import annotations

import html as _htmllib
import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_CORPUS_VERSION = 5  # bump to invalidate /tmp caches when generation changes

_LANGS = ["en", "de", "fr", "es", "it", "nl"]

_NAV = "Home News Sports Archive About Contact Privacy Terms Subscribe"
_FOOTER = "Copyright Example Media Group. All rights reserved. Sitemap RSS"


@dataclass(frozen=True)
class CorpusSpec:
    n_docs: int = 2000
    seed: int = 42
    vocab_size: int = 1500
    min_words: int = 80
    max_words: int = 600
    frac_unique: float = 0.60
    frac_exact: float = 0.10
    frac_near_high: float = 0.10
    frac_near_low: float = 0.10
    frac_containment: float = 0.05
    frac_boilerplate: float = 0.05
    # edit rates (token substitution probability)
    near_high_p: tuple[float, float] = (0.002, 0.015)
    near_low_p: tuple[float, float] = (0.04, 0.10)
    large_groups: int = 2  # number of size-~50 groups when n_docs >= 2000
    large_group_size: int = 50
    shingle_k: int = 5  # for jaccard_true in the oracle
    # host-name prefix so two corpora (e.g. a base store and an
    # increment shard) get DISJOINT urls and therefore doc_ids
    url_prefix: str = ""


def _vocab(spec: CorpusSpec) -> tuple[np.ndarray, np.ndarray]:
    words = np.array([f"w{i:04d}" for i in range(spec.vocab_size)])
    ranks = np.arange(1, spec.vocab_size + 1, dtype=np.float64)
    p = 1.0 / ranks**1.05
    return words, np.cumsum(p / p.sum())


def _sample_tokens(rng: np.random.Generator, cdf: np.ndarray, n: int) -> np.ndarray:
    return np.searchsorted(cdf, rng.random(n), side="right").astype(np.int32)


def _substitute(
    rng: np.random.Generator, toks: np.ndarray, p: float, cdf: np.ndarray
) -> np.ndarray:
    out = toks.copy()
    m = max(1, int(round(p * toks.shape[0])))
    pos = rng.choice(toks.shape[0], size=min(m, toks.shape[0]), replace=False)
    out[pos] = _sample_tokens(rng, cdf, pos.shape[0])
    return out


def _shingle_set(t: np.ndarray, k: int) -> set[tuple[int, ...]]:
    if t.shape[0] < k:
        return {tuple(t.tolist())}
    view = np.lib.stride_tricks.sliding_window_view(t, k)
    return set(map(tuple, view.tolist()))


def _true_jaccard(a: np.ndarray, b: np.ndarray, k: int) -> tuple[float, float]:
    """(jaccard, containment) of word-k-gram shingle sets over token-id
    sequences; containment = |inter| / min(|a|, |b|) (the coverage the
    suffix/winnowing pass scores against)."""
    sa, sb = _shingle_set(a, k), _shingle_set(b, k)
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    jac = inter / union if union else 1.0
    cont = inter / max(1, min(len(sa), len(sb)))
    return jac, cont


def build_corpus(spec: CorpusSpec) -> dict[str, pa.Table]:
    rng = np.random.Generator(np.random.PCG64(spec.seed))
    words, cdf = _vocab(spec)

    doc_tokens: list[np.ndarray] = []
    groups: list[int] = []
    variants: list[str] = []
    group_members: dict[int, list[int]] = {}
    gid = 0

    classes = ["unique", "exact", "near-high", "near-low", "containment", "boilerplate-twin"]
    probs = np.array(
        [
            spec.frac_unique,
            spec.frac_exact,
            spec.frac_near_high,
            spec.frac_near_low,
            spec.frac_containment,
            spec.frac_boilerplate,
        ]
    )
    probs = probs / probs.sum()
    ccdf = np.cumsum(probs)

    def new_doclen() -> int:
        return int(rng.integers(spec.min_words, spec.max_words + 1))

    # SITE-WIDE boilerplate pool: few blocks reused by MANY twin groups, so
    # each block's containment fingerprints exceed the hot-key cap and get
    # dropped (the designed skew mechanism) instead of linking twins.
    n_bp_blocks = max(2, spec.n_docs // 1000)
    bp_pool = [
        _sample_tokens(rng, cdf, int(rng.integers(60, 140))) for _ in range(n_bp_blocks)
    ]

    def add_doc(toks: np.ndarray, g: int, variant: str) -> None:
        doc_tokens.append(toks)
        groups.append(g)
        variants.append(variant)
        group_members.setdefault(g, []).append(len(doc_tokens) - 1)

    # a couple of large hot groups first (pair-explosion / hot-band stress)
    n_large = spec.large_groups if spec.n_docs >= 2000 else 0
    for li in range(n_large):
        base = _sample_tokens(rng, cdf, new_doclen())
        add_doc(base, gid, "base")
        for _ in range(spec.large_group_size - 1):
            if li % 2 == 0:
                add_doc(base, gid, "exact")
            else:
                p = rng.uniform(*spec.near_high_p)
                add_doc(_substitute(rng, base, p, cdf), gid, "near-high")
        gid += 1

    while len(doc_tokens) < spec.n_docs:
        cls = classes[int(np.searchsorted(ccdf, rng.random(), side="right"))]
        if cls == "unique":
            add_doc(_sample_tokens(rng, cdf, new_doclen()), gid, "unique")
            gid += 1
            continue
        size = int(rng.integers(2, 6))
        base = _sample_tokens(rng, cdf, new_doclen())
        if cls == "boilerplate-twin":
            # shared SITE-WIDE boilerplate block + unique bodies.
            # Must NOT cluster: stresses hot containment-fingerprint keys.
            block = bp_pool[int(rng.integers(0, n_bp_blocks))]
            for _ in range(size):
                body = _sample_tokens(rng, cdf, new_doclen())
                cut = int(rng.integers(0, body.shape[0] + 1))
                add_doc(np.concatenate([body[:cut], block, body[cut:]]), gid, "boilerplate-twin")
            gid += 1
            continue
        add_doc(base, gid, "base")
        for _ in range(size - 1):
            if cls == "exact":
                add_doc(base, gid, "exact")
            elif cls == "near-high":
                add_doc(_substitute(rng, base, rng.uniform(*spec.near_high_p), cdf), gid, "near-high")
            elif cls == "near-low":
                add_doc(_substitute(rng, base, rng.uniform(*spec.near_low_p), cdf), gid, "near-low")
            elif cls == "containment":
                # contiguous 20-40% slice of base embedded in unique filler
                frac = rng.uniform(0.20, 0.40)
                fl = max(spec.shingle_k + 1, int(frac * base.shape[0]))
                start = int(rng.integers(0, base.shape[0] - fl + 1))
                frag = base[start : start + fl]
                pre = _sample_tokens(rng, cdf, int(rng.integers(10, 60)))
                post = _sample_tokens(rng, cdf, int(rng.integers(10, 60)))
                add_doc(np.concatenate([pre, frag, post]), gid, "containment")
        gid += 1

    doc_tokens = doc_tokens[: spec.n_docs]
    groups = groups[: spec.n_docs]
    variants = variants[: spec.n_docs]
    n = len(doc_tokens)

    texts = [" ".join(words[t]) for t in doc_tokens]
    urls = [
        f"https://{spec.url_prefix}site{groups[i] % 97}.example/p/{i:07d}"
        for i in range(n)
    ]
    ts = (np.int64(1_700_000_000_000_000) + np.arange(n, dtype=np.int64) * 1_000_003)
    langs = np.where(rng.random(n) < 0.95, "en", rng.choice(_LANGS[1:], size=n))

    htmls = [render_html(urls[i], texts[i]) for i in range(n)]

    pages = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs.tolist(), type=pa.string()),
        }
    )
    oracle_clusters = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "group_id": pa.array(np.asarray(groups, dtype=np.uint64), type=pa.uint64()),
            "variant": pa.array(variants, type=pa.string()),
        }
    )

    pa_rows: dict[str, list] = {
        "a_url": [], "b_url": [], "kind": [], "jaccard_true": [], "containment_true": []
    }
    for g, members in group_members.items():
        if len(members) < 2:
            continue
        members = [m for m in members if m < n]
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, b = members[i], members[j]
                va, vb = variants[a], variants[b]
                if "boilerplate-twin" in (va, vb):
                    kind = "boilerplate-twin"
                elif "containment" in (va, vb):
                    kind = "containment"
                elif va == vb == "exact" or {va, vb} <= {"base", "exact"}:
                    kind = "exact"
                else:
                    kind = "near"
                jt, ct = _true_jaccard(doc_tokens[a], doc_tokens[b], spec.shingle_k)
                pa_rows["a_url"].append(urls[a])
                pa_rows["b_url"].append(urls[b])
                pa_rows["kind"].append(kind)
                pa_rows["jaccard_true"].append(jt)
                pa_rows["containment_true"].append(ct)
    oracle_pairs = pa.table(
        {
            "a_url": pa.array(pa_rows["a_url"], type=pa.string()),
            "b_url": pa.array(pa_rows["b_url"], type=pa.string()),
            "kind": pa.array(pa_rows["kind"], type=pa.string()),
            "jaccard_true": pa.array(pa_rows["jaccard_true"], type=pa.float32()),
            "containment_true": pa.array(pa_rows["containment_true"], type=pa.float32()),
        }
    )
    return {"pages": pages, "oracle_clusters": oracle_clusters, "oracle_pairs": oracle_pairs}


def render_html(url: str, text: str) -> bytes:
    """Fixed boilerplate template wrapping escaped text; the exact inverse
    of ``raydedup.stages.extract.extract_text_from_html``."""
    body = _htmllib.escape(text, quote=False)
    doc = (
        "<html><head><meta charset=\"utf-8\"/><title>"
        + _htmllib.escape(url, quote=False)
        + "</title></head><body><nav>"
        + _NAV
        + "</nav><main>"
        + body
        + "</main><footer>"
        + _FOOTER
        + "</footer></body></html>"
    )
    return doc.encode("utf-8")


def materialize_corpus(
    out_dir: str, spec: CorpusSpec, n_files: int = 8, force: bool = False
) -> dict[str, str]:
    """Write (cached) corpus parquet under ``out_dir``; returns paths.

    pages are split into ``n_files`` row-aligned files to exercise
    parallel reads; a manifest pins the spec so stale caches regenerate.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "corpus_manifest.json")
    # json round-trip normalizes tuples -> lists; without it the spec's
    # tuple fields (near_high_p/near_low_p) never compare equal to the
    # reloaded manifest and the cache silently regenerates every time
    want = json.loads(
        json.dumps({"spec": asdict(spec), "n_files": n_files, "version": _CORPUS_VERSION})
    )
    if not force and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == want:
                return {
                    "pages": os.path.join(out_dir, "pages"),
                    "oracle_clusters": os.path.join(out_dir, "oracle_clusters.parquet"),
                    "oracle_pairs": os.path.join(out_dir, "oracle_pairs.parquet"),
                }
    tables = build_corpus(spec)
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    for old in os.listdir(pages_dir):
        os.remove(os.path.join(pages_dir, old))
    pages = tables["pages"]
    n = pages.num_rows
    step = max(1, (n + n_files - 1) // n_files)
    for fi, start in enumerate(range(0, n, step)):
        pq.write_table(
            pages.slice(start, step), os.path.join(pages_dir, f"part-{fi:05d}.parquet")
        )
    pq.write_table(tables["oracle_clusters"], os.path.join(out_dir, "oracle_clusters.parquet"))
    pq.write_table(tables["oracle_pairs"], os.path.join(out_dir, "oracle_pairs.parquet"))
    with open(manifest_path, "w") as f:
        json.dump(want, f)
    return {
        "pages": pages_dir,
        "oracle_clusters": os.path.join(out_dir, "oracle_clusters.parquet"),
        "oracle_pairs": os.path.join(out_dir, "oracle_pairs.parquet"),
    }
