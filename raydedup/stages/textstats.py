"""Text-analysis operators over document tables.

These are the training-data-pipeline operators the engine adds beyond
the reference's own surface (BASELINE.md graft targets): language ID,
quality scoring, token counting, rolling-hash document fingerprints.
All are stateless vectorized ``map_batches`` stages; the lang-ID stage
is a callable class (actor pool) because it compiles its stopword
tables once (the ST1 reusable-state pattern,
``PanakoStorageKV.java:82-131`` analog).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from raydedup.hashing import U64, rolling_hash_u64, fnv1a64

# small built-in stopword profiles (n-gram heuristic, no external data)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "on"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que", "dans"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "no", "por", "que", "para"},
    "it": {"il", "la", "le", "e", "è", "un", "una", "non", "per", "che", "con", "di"},
    "nl": {"de", "het", "een", "en", "is", "niet", "van", "op", "dat", "voor", "met"},
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish subword estimate per doc.

    ``n_tokens``: whitespace tokens. ``n_subwords``: a regex-free
    deterministic estimate (~chars/4 per token, min 1) matching typical
    BPE token rates on ASCII text.
    """
    texts = batch.column(text_col)
    # vectorized whitespace-token count via Arrow kernels
    trimmed = pc.utf8_trim_whitespace(texts)
    n_tokens = pc.list_value_length(pc.utf8_split_whitespace(trimmed))
    n_tokens = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), 0, n_tokens)
    n_chars = pc.utf8_length(texts)
    toks = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
    chars = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
    subwords = np.where(
        toks > 0, np.maximum(toks, np.ceil((chars - toks + 1) / 4.0)), 0
    ).astype(np.int64)
    return batch.append_column(
        "n_tokens", pc.cast(n_tokens, pa.int64())
    ).append_column("n_subwords", pa.array(subwords, type=pa.int64()))


# GPT-2-style BPE pre-tokenizer, restricted to RE2 syntax (no lookahead:
# the trailing `\s+(?!\S)` alternative of the published pattern is folded
# into plain `\s+`, which only changes how a run of spaces BEFORE a word
# is split — the COUNT of matches it yields differs from the lookahead
# form only on interior multi-space runs, and deterministically so).
# Arrow's count_substring_regex and DuckDB's regexp_extract_all both run
# RE2, so the oracle mirror is exact by construction.
BPE_PRETOKEN_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Count GPT-2-style pre-tokenizer matches per doc (``n_bpe_tokens``).

    A true-regex refinement of ``token_count_batch``'s chars/4 subword
    estimate: contractions, letter runs, digit runs, punctuation runs and
    whitespace runs are segmented exactly as a BPE pre-tokenizer would
    (minus merges, which need a learned vocab). One Arrow RE2 kernel over
    the column — zero Python per row, row-local, streams at any scale.
    """
    n = pc.count_substring_regex(batch.column(text_col), BPE_PRETOKEN_RE)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics: mean word length, punctuation ratio, digit
    ratio, uppercase ratio, and a composite [0,1] quality score."""
    texts = batch.column(text_col)
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.float64)
    trimmed = pc.utf8_trim_whitespace(texts)
    n_tok = pc.list_value_length(pc.utf8_split_whitespace(trimmed))
    n_tok = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0), 0, n_tok)
    n_tok = n_tok.to_numpy(zero_copy_only=False).astype(np.float64)

    def count_matching(pattern: str) -> np.ndarray:
        return (
            pc.count_substring_regex(texts, pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )

    n_punct = count_matching(r"[\.,;:!\?]")
    n_digit = count_matching(r"[0-9]")
    n_upper = count_matching(r"[A-Z]")
    denom = np.maximum(n_chars, 1.0)
    mean_word_len = np.where(n_tok > 0, (n_chars - np.maximum(n_tok - 1, 0)) / np.maximum(n_tok, 1), 0.0)
    punct_ratio = n_punct / denom
    digit_ratio = n_digit / denom
    upper_ratio = n_upper / denom
    # composite: long-enough docs with word-like structure score high
    score = np.clip(
        np.minimum(n_tok / 50.0, 1.0)
        * np.clip(1.0 - 2.0 * digit_ratio, 0.0, 1.0)
        * np.clip(1.0 - 2.0 * np.maximum(punct_ratio - 0.15, 0.0), 0.0, 1.0)
        * np.where((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0, 0.5),
        0.0,
        1.0,
    )
    out = batch
    for name, arr in [
        ("mean_word_len", mean_word_len),
        ("punct_ratio", punct_ratio),
        ("digit_ratio", digit_ratio),
        ("upper_ratio", upper_ratio),
        ("quality", score),
    ]:
        out = out.append_column(name, pa.array(arr, type=pa.float64()))
    return out


class LangIdKernel:
    """Actor-pool language ID: stopword-profile voting + CJK char ratio.

    Stopword tables are frozen sets built once per actor; per batch the
    work is one pandas str.split + set intersections per row.
    """

    def __init__(self) -> None:
        self.profiles = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        langs = []
        confs = []
        for t in texts:
            t = t or ""
            # CJK shortcut: any run of CJK chars dominates
            cjk = sum(1 for ch in t[:400] if "一" <= ch <= "鿿")
            if cjk > max(4, len(t[:400]) * 0.2):
                langs.append("zh")
                confs.append(min(1.0, cjk / max(len(t[:400]), 1)))
                continue
            words = t.lower().split()[:200]
            if not words:
                langs.append("und")
                confs.append(0.0)
                continue
            ws = set(words)
            best, best_hits = "und", 0
            for lang, prof in self.profiles.items():
                hits = len(ws & prof)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best if best_hits >= 2 else "und")
            confs.append(best_hits / 12.0)
        return batch.append_column(
            "lang_pred", pa.array(langs, type=pa.string())
        ).append_column("lang_conf", pa.array(confs, type=pa.float64()))


def doc_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling-hash document fingerprint (first winnowed-min of
    the whole doc) + FNV whole-text hash — the ``panako resolve`` /
    content-hash analog (``util/FileUtils.java:483-510``)."""
    texts = batch.column(text_col).to_pylist()
    full = np.fromiter(
        (fnv1a64((t or "").encode("utf-8")) for t in texts),
        dtype=U64,
        count=len(texts),
    )
    roll = np.empty(len(texts), dtype=U64)
    for i, t in enumerate(texts):
        data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
        h = rolling_hash_u64(data, min(32, max(1, data.shape[0])))
        roll[i] = h.min() if h.shape[0] else 0
    return batch.append_column(
        "text_hash", pa.array(full.view(np.int64), type=pa.int64())
    ).append_column("rolling_fp", pa.array(roll.view(np.int64), type=pa.int64()))


def _segment_distinct_max(
    h: np.ndarray, doc_of: np.ndarray, ndocs: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-document distinct count and maximum multiplicity over a flat
    (value, doc) pairing — one lexsort, no per-doc Python.

    ``h[i]`` belongs to doc ``doc_of[i]``; returns int64 arrays
    ``(distinct[d], max_mult[d])`` with zeros for docs owning no items.
    """
    distinct = np.zeros(ndocs, dtype=np.int64)
    max_mult = np.zeros(ndocs, dtype=np.int64)
    if h.shape[0] == 0:
        return distinct, max_mult
    order = np.lexsort((h, doc_of))
    hs, ds = h[order], doc_of[order]
    new_run = np.empty(hs.shape[0], dtype=bool)
    new_run[0] = True
    new_run[1:] = (hs[1:] != hs[:-1]) | (ds[1:] != ds[:-1])
    distinct = np.bincount(ds[new_run], minlength=ndocs).astype(np.int64)
    starts = np.flatnonzero(new_run)
    run_len = np.diff(starts, append=np.int64(hs.shape[0]))
    np.maximum.at(max_mult, ds[starts], run_len)
    return distinct, max_mult


def _gather_valid_windows(
    h: np.ndarray, ws: np.ndarray, we: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Flatten per-doc window slices ``h[ws[d]:we[d]]`` into one array
    plus its doc index — windows crossing doc boundaries never appear."""
    lens = (we - ws).astype(np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=h.dtype), np.empty(0, dtype=np.int64)
    doc_of = np.repeat(np.arange(lens.shape[0], dtype=np.int64), lens)
    seg_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
    pos = np.arange(total, dtype=np.int64) - seg_start[doc_of] + ws[doc_of]
    return h[pos], doc_of


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Intra-document repetition signals (the Gopher-style quality
    filters a training-data pipeline applies before dedup):

    - ``n_lines``, ``dup_line_frac``: lines = raw split on ``\\n``
      (empty doc = one empty line); duplicate fraction =
      ``(n - n_distinct) / n``.
    - ``dup_word_frac``: duplicate fraction over lowered whitespace
      tokens.
    - ``dup_2gram_frac`` / ``dup_3gram_frac``: duplicate fraction over
      word 2-/3-grams (0 when the doc has no such gram).
    - ``top_2gram_frac``: multiplicity of the most frequent 2-gram over
      the total 2-gram count.

    All divisions are raw IEEE float64 (no rounding) for cross-engine
    oracle parity. Fully vectorized: tokens/grams ride the signature
    stage's batched word-hash + global rolling-hash kernels (non-ASCII
    docs take the per-doc slow path, bit-identical); line identity uses
    Arrow dictionary codes, so no string hashing at all.
    """
    from raydedup.stages.signatures import (
        _WORD_CACHE,
        batch_word_hashes,
        rolling_hash_segments,
        tokenize,
    )

    col = batch.column(text_col)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    n = len(arr)

    # --- lines: batch-global dictionary codes as identity labels ---
    lines = pc.split_pattern(arr, "\n")
    n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    l_offs = lines.offsets.to_numpy().astype(np.int64)
    vals = lines.values
    if l_offs[0] != 0 or len(vals) != l_offs[-1] - l_offs[0]:
        vals = vals.slice(l_offs[0], l_offs[-1] - l_offs[0])
    codes = vals.dictionary_encode().indices.to_numpy(zero_copy_only=False)
    line_doc = np.repeat(np.arange(n, dtype=np.int64), n_lines)
    d_lines, _ = _segment_distinct_max(codes, line_doc, n)

    # --- tokens + word n-grams ---
    n_tok = np.zeros(n, dtype=np.int64)
    d_tok = np.zeros(n, dtype=np.int64)
    n2 = np.zeros(n, dtype=np.int64)
    d2 = np.zeros(n, dtype=np.int64)
    m2 = np.zeros(n, dtype=np.int64)
    n3 = np.zeros(n, dtype=np.int64)
    d3 = np.zeros(n, dtype=np.int64)

    ascii_mask = pc.string_is_ascii(arr).to_numpy(zero_copy_only=False)
    a_idx = np.flatnonzero(ascii_mask)
    if a_idx.shape[0]:
        sub = arr.filter(pa.array(ascii_mask))
        flat, offs = batch_word_hashes(sub)
        cnt = np.diff(offs)
        n_tok[a_idx] = cnt
        tok_doc = np.repeat(np.arange(a_idx.shape[0], dtype=np.int64), cnt)
        dsub, _ = _segment_distinct_max(flat, tok_doc, a_idx.shape[0])
        d_tok[a_idx] = dsub
        for k, n_out, d_out, m_out in ((2, n2, d2, m2), (3, n3, d3, None)):
            h, ws, we = rolling_hash_segments(flat, offs, k)
            hv, doc_of = _gather_valid_windows(h, ws, we)
            n_out[a_idx] = we - ws
            dk, mk = _segment_distinct_max(hv, doc_of, a_idx.shape[0])
            d_out[a_idx] = dk
            if m_out is not None:
                m_out[a_idx] = mk

    slow = np.flatnonzero(~ascii_mask)
    if slow.shape[0]:
        texts = arr.to_pylist()
        for d in slow:
            wh = _WORD_CACHE.hash_words(tokenize(texts[d]))
            n_tok[d] = wh.shape[0]
            d_tok[d] = np.unique(wh).shape[0]
            for k, n_out, d_out, m_out in ((2, n2, d2, m2), (3, n3, d3, None)):
                hk = rolling_hash_u64(wh, k)
                n_out[d] = hk.shape[0]
                if hk.shape[0]:
                    _, counts = np.unique(hk, return_counts=True)
                    d_out[d] = counts.shape[0]
                    if m_out is not None:
                        m_out[d] = counts.max()

    def frac(num: np.ndarray, den: np.ndarray) -> np.ndarray:
        return np.where(den > 0, num / np.maximum(den, 1), 0.0)

    out = batch
    for name, vals_ in [
        ("n_lines", n_lines),
        ("dup_line_frac", frac(n_lines - d_lines, n_lines)),
        ("dup_word_frac", frac(n_tok - d_tok, n_tok)),
        ("dup_2gram_frac", frac(n2 - d2, n2)),
        ("dup_3gram_frac", frac(n3 - d3, n3)),
        ("top_2gram_frac", frac(m2, n2)),
    ]:
        typ = pa.int64() if vals_.dtype == np.int64 else pa.float64()
        out = out.append_column(name, pa.array(vals_, type=typ))
    return out


def doc_stats(docs: Dataset, by: str = "lang") -> Dataset:
    """Grouped corpus statistics (A6 ``panako stats`` analog:
    ``PanakoStorageKV.java:381-467``)."""
    from ray.data.aggregate import Count, Max, Mean, Min

    with_len = docs.map_batches(
        lambda t: t.append_column("text_len", pc.cast(pc.utf8_length(t["text"]), pa.int64())),
        batch_format="pyarrow",
    )
    return with_len.groupby(by).aggregate(
        Count(alias_name="n_docs"),
        Mean("text_len", alias_name="avg_len"),
        Min("text_len", alias_name="min_len"),
        Max("text_len", alias_name="max_len"),
    )


# Disjoint character classes for the script/charset profile. RE2 syntax
# on BOTH engines (Arrow's count_substring_regex and DuckDB's regexp_*
# are RE2), so counts agree exactly; every class matches single chars,
# so "count of matches" == "count of chars in class".
SCRIPT_CLASSES: list[tuple[str, str]] = [
    ("ascii_alpha", r"[A-Za-z]"),
    ("digit", r"[0-9]"),
    ("space", r"\s"),
    ("han", r"\p{Han}"),
    ("cyrillic", r"\p{Cyrillic}"),
    ("arabic", r"\p{Arabic}"),
]


def script_profile_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc Unicode script/charset profile: exact char counts per
    disjoint class + the remainder, and the non-ASCII-alpha ratio the
    charset-sanity filter reads (mojibake and wrong-decode pages jump
    out as high `other`). Row-local, one RE2 column kernel per class."""
    if batch.num_rows == 0 or text_col not in batch.column_names:
        fields = [("doc_id", pa.int64()), ("n_chars", pa.int64())]
        fields += [(f"n_{n}", pa.int64()) for n, _ in SCRIPT_CLASSES]
        fields += [("n_other", pa.int64()), ("other_ratio", pa.float64())]
        return pa.schema(fields).empty_table()
    texts = pc.fill_null(batch.column(text_col), "")
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    cols: dict[str, pa.Array] = {
        "doc_id": batch.column("doc_id").cast(pa.int64()),
        "n_chars": pa.array(n_chars, pa.int64()),
    }
    rest = n_chars.copy()
    for name, pattern in SCRIPT_CLASSES:
        c = (
            pc.count_substring_regex(texts, pattern)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        cols[f"n_{name}"] = pa.array(c, pa.int64())
        rest -= c
    cols["n_other"] = pa.array(rest, pa.int64())
    cols["other_ratio"] = pa.array(
        rest / np.maximum(n_chars, 1), pa.float64()
    )
    return pa.table(cols)


def script_profile(docs: Dataset, text_col: str = "text") -> Dataset:
    """docs -> per-doc script/charset counts (streams, zero shuffle)."""
    return docs.map_batches(
        lambda t: script_profile_batch(t, text_col), batch_format="pyarrow"
    )


# line-class patterns (RE2 both sides; order-free, each counted independently)
DOCTYPE_CODE_RE = r"[;{}]"          # statement/brace debris on the line
DOCTYPE_BULLET_RE = r"^\s*[-*•]"    # list bullet after leading whitespace


def doc_type_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Coarse document-type heuristic: per-doc line-class counts plus a
    deterministic integer-arithmetic verdict.

    ``n_lines`` (non-empty), ``n_code_lines`` (line contains ``;``/
    ``{``/``}``), ``n_bullet_lines`` (leading bullet), and ``doc_type``:
    'code' when ``4*n_code_lines >= n_lines`` (>=25% code debris),
    else 'list' when ``2*n_bullet_lines >= n_lines``, else 'prose'
    ('empty' when no non-empty lines). The code-vs-prose gate every
    training-mix recipe applies before routing docs to domain buckets.
    One line split + two RE2 kernels per batch; row-local, streams.
    """
    from raydedup.stages.lines import _batch_line_arrays

    vals, doc_of, lens = _batch_line_arrays(batch)
    n = batch.num_rows
    n_lines = np.zeros(n, dtype=np.int64)
    n_code = np.zeros(n, dtype=np.int64)
    n_bullet = np.zeros(n, dtype=np.int64)
    if len(vals):
        nonempty = pc.not_equal(vals, "").to_numpy(zero_copy_only=False)
        code = pc.match_substring_regex(vals, DOCTYPE_CODE_RE).to_numpy(
            zero_copy_only=False
        )
        bullet = pc.match_substring_regex(vals, DOCTYPE_BULLET_RE).to_numpy(
            zero_copy_only=False
        )
        np.add.at(n_lines, doc_of[nonempty], 1)
        np.add.at(n_code, doc_of[nonempty & code], 1)
        np.add.at(n_bullet, doc_of[nonempty & bullet], 1)
    dtype = np.where(
        n_lines == 0,
        "empty",
        np.where(
            4 * n_code >= np.maximum(n_lines, 1),
            "code",
            np.where(2 * n_bullet >= np.maximum(n_lines, 1), "list", "prose"),
        ),
    )
    # n_lines==0 rows fall through the maximum(,1) guards above, but the
    # outer where already routed them to 'empty'
    return (
        batch.append_column("n_lines", pa.array(n_lines, pa.int64()))
        .append_column("n_code_lines", pa.array(n_code, pa.int64()))
        .append_column("n_bullet_lines", pa.array(n_bullet, pa.int64()))
        .append_column("doc_type", pa.array(dtype.tolist(), pa.large_string()))
    )
