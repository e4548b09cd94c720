"""Web-text quality FILTER rules: Gopher-style doc gates + C4 line clean.

The reference's A5/A6 acceptance surface (``strategy/olaf/OlafStrategy.java``
hit-quality gating before a match is reported, ``cli/Stats.java``) has a
web-text analog every LLM-training pipeline runs before dedup: document-
level heuristic gates (the MassiveText/Gopher rules, Rae et al. 2021) and
line-level boilerplate removal (the C4 rules, Raffel et al. 2020). Both
papers are public; the thresholds here are module constants so the SQL
oracle mirrors embed the LITERAL same integers.

Bit-parity design (see ``raydedup/stages/textstats.py`` for the softer
scoring variants): every rule is an INTEGER comparison — fractions are
cross-multiplied (``10*n_ellipsis_lines < 3*n_lines`` instead of
``n_ellipsis/n_lines < 0.3``) so no float ever forms. Counts come from
Arrow kernels over the flattened line/word list arrays with
``np.add.reduceat`` per-doc reductions; no per-row Python anywhere.

Scale: both operators are row-local single-pass ``map_batches`` — they
stream, shuffle nothing, and the only state is the compiled RE2 patterns
inside Arrow's kernel cache.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

I64 = np.int64

# ---- Gopher-style document gates (integer thresholds; SQL mirrors import
# these) -------------------------------------------------------------------
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_MIN = 3  # mean word length lower bound: MWL_MIN*n_words <= word_chars
GOPHER_MWL_MAX = 10  # upper bound: word_chars <= MWL_MAX*n_words
GOPHER_ALPHA_NUM = 4  # alpha-word fraction > 4/5: 5*n_alpha >= 4*n_words
GOPHER_ALPHA_DEN = 5
GOPHER_BULLET_NUM = 9  # bullet-line fraction < 9/10: 10*n_bullet < 9*n_lines
GOPHER_BULLET_DEN = 10
GOPHER_ELLIPSIS_NUM = 3  # ellipsis-line fraction < 3/10
GOPHER_ELLIPSIS_DEN = 10
GOPHER_MIN_STOPWORDS = 2
GOPHER_STOPWORDS: tuple[str, ...] = (
    "the", "be", "to", "of", "and", "that", "have", "with",
)
BULLET_RE = r"^\s*[-*•]"
ELLIPSIS_RE = r"\.\.\.$"

# ---- C4-style line rules ---------------------------------------------------
C4_MIN_LINE_WORDS = 3
C4_TERMINAL_RE = r'[.!?"]$'
C4_BAD_LINE_MARKERS: tuple[str, ...] = ("javascript", "cookie")
C4_BAD_DOC_MARKERS: tuple[str, ...] = ("lorem ipsum", "{")


def _line_list(texts: pa.Array) -> tuple[np.ndarray, pa.Array]:
    """Split a string column on newlines -> (int64 offsets, flat lines)."""
    ll = pc.split_pattern(texts, pattern="\n")
    if isinstance(ll, pa.ChunkedArray):
        ll = ll.combine_chunks()
    return ll.offsets.to_numpy().astype(I64), ll.values


def _word_list(texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Whitespace-split -> (offsets, flat words, n_words per doc).

    Matches DuckDB ``string_split_regex(trim(text), '\\s+')`` with the
    shared empty-text guard: a fully-whitespace doc counts 0 words.
    """
    trimmed = pc.utf8_trim_whitespace(texts)
    wl = pc.utf8_split_whitespace(trimmed)
    if isinstance(wl, pa.ChunkedArray):
        wl = wl.combine_chunks()
    offs = wl.offsets.to_numpy().astype(I64)
    n_words = np.diff(offs).astype(I64)
    empty = pc.equal(pc.utf8_length(trimmed), 0).to_numpy(zero_copy_only=False)
    n_words = np.where(empty, 0, n_words).astype(I64)
    return offs, wl.values, n_words


def _per_doc_sum(mask: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Sum a per-element boolean over list boundaries -> per-doc int64."""
    n_docs = offs.shape[0] - 1
    out = np.zeros(n_docs, dtype=I64)
    nonempty = np.flatnonzero(np.diff(offs) > 0)
    if nonempty.shape[0] and mask.shape[0]:
        out[nonempty] = np.add.reduceat(mask.astype(I64), offs[nonempty])
    return out


def gopher_rules_batch(
    t: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Per-doc Gopher gate counts + integer rule verdicts (0/1 BIGINT)."""
    if t.num_rows == 0 or t.num_columns == 0:
        return t
    texts = pc.cast(t.column(text_col), pa.string()).combine_chunks()
    ids = pc.cast(t.column(id_col), pa.int64())

    woffs, wvals, n_words = _word_list(texts)
    # non-whitespace char count == total chars across words (RE2 '\s' on
    # both sides: SQL length(regexp_replace(text, '\s', '', 'g')))
    word_chars = (
        pc.utf8_length(pc.replace_substring_regex(texts, pattern=r"\s", replacement=""))
        .to_numpy(zero_copy_only=False)
        .astype(I64)
    )
    alpha = pc.match_substring_regex(wvals, "[a-zA-Z]").to_numpy(zero_copy_only=False)
    n_alpha = _per_doc_sum(alpha, woffs)

    wlow = pc.utf8_lower(wvals)
    n_stop = np.zeros(n_words.shape[0], dtype=I64)
    for sw in GOPHER_STOPWORDS:
        hit = pc.equal(wlow, sw).to_numpy(zero_copy_only=False)
        n_stop += (_per_doc_sum(hit, woffs) > 0).astype(I64)

    loffs, lvals = _line_list(texts)
    n_lines = np.diff(loffs).astype(I64)
    bullet = pc.match_substring_regex(lvals, BULLET_RE).to_numpy(zero_copy_only=False)
    ellip = pc.match_substring_regex(lvals, ELLIPSIS_RE).to_numpy(zero_copy_only=False)
    n_bullet = _per_doc_sum(bullet, loffs)
    n_ellipsis = _per_doc_sum(ellip, loffs)

    words_ok = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
    mwl_ok = (GOPHER_MWL_MIN * n_words <= word_chars) & (
        word_chars <= GOPHER_MWL_MAX * n_words
    )
    alpha_ok = GOPHER_ALPHA_DEN * n_alpha >= GOPHER_ALPHA_NUM * n_words
    stop_ok = n_stop >= GOPHER_MIN_STOPWORDS
    bullet_ok = GOPHER_BULLET_DEN * n_bullet < GOPHER_BULLET_NUM * n_lines
    ellipsis_ok = GOPHER_ELLIPSIS_DEN * n_ellipsis < GOPHER_ELLIPSIS_NUM * n_lines
    keep = words_ok & mwl_ok & alpha_ok & stop_ok & bullet_ok & ellipsis_ok

    cols: dict[str, pa.Array] = {id_col: ids}
    for name, arr in [
        ("n_words", n_words),
        ("word_chars", word_chars),
        ("n_alpha_words", n_alpha),
        ("n_stopwords", n_stop),
        ("n_lines", n_lines),
        ("n_bullet_lines", n_bullet),
        ("n_ellipsis_lines", n_ellipsis),
    ]:
        cols[name] = pa.array(arr, type=pa.int64())
    for name, arr in [
        ("words_ok", words_ok),
        ("mwl_ok", mwl_ok),
        ("alpha_ok", alpha_ok),
        ("stop_ok", stop_ok),
        ("bullet_ok", bullet_ok),
        ("ellipsis_ok", ellipsis_ok),
        ("keep", keep),
    ]:
        cols[name] = pa.array(arr.astype(I64), type=pa.int64())
    return pa.table(cols)


def gopher_rules(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """Gopher-style doc-quality gates over a (id, text) dataset."""
    return ds.map_batches(
        lambda t: gopher_rules_batch(t, id_col, text_col), batch_format="pyarrow"
    )


def c4_line_filter_batch(
    t: pa.Table, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """C4-style line retention: per-doc kept-line counts + cleaned text.

    A line survives iff it has >= C4_MIN_LINE_WORDS whitespace words, ends
    in terminal punctuation, and carries no boilerplate marker. The doc
    itself is flagged dropped (keep_doc=0) if the raw text contains a
    bad-doc marker; counts and clean_text are still emitted so the
    decision is observable rather than applied.
    """
    if t.num_rows == 0 or t.num_columns == 0:
        return t
    texts = pc.cast(t.column(text_col), pa.string()).combine_chunks()
    ids = pc.cast(t.column(id_col), pa.int64())

    loffs, lvals = _line_list(texts)
    n_lines = np.diff(loffs).astype(I64)

    ltrim = pc.utf8_trim_whitespace(lvals)
    wc = pc.list_value_length(pc.utf8_split_whitespace(ltrim))
    wc = pc.if_else(pc.equal(pc.utf8_length(ltrim), 0), 0, wc)
    wc = wc.to_numpy(zero_copy_only=False).astype(I64)
    terminal = pc.match_substring_regex(lvals, C4_TERMINAL_RE).to_numpy(
        zero_copy_only=False
    )
    llow = pc.utf8_lower(lvals)
    bad = np.zeros(wc.shape[0], dtype=bool)
    for marker in C4_BAD_LINE_MARKERS:
        bad |= pc.match_substring(llow, marker).to_numpy(zero_copy_only=False)
    keep_line = (wc >= C4_MIN_LINE_WORDS) & terminal & ~bad

    n_kept = _per_doc_sum(keep_line, loffs)
    kept_vals = lvals.filter(pa.array(keep_line))
    new_offs = np.zeros(n_kept.shape[0] + 1, dtype=np.int64)
    new_offs[1:] = np.cumsum(n_kept)
    new_offs = new_offs.astype(np.int32)
    kept_list = pa.ListArray.from_arrays(pa.array(new_offs, pa.int32()), kept_vals)
    clean = pc.binary_join(kept_list, "\n")

    tlow = pc.utf8_lower(texts)
    bad_doc = np.zeros(t.num_rows, dtype=bool)
    for marker in C4_BAD_DOC_MARKERS:
        bad_doc |= pc.match_substring(tlow, marker).to_numpy(zero_copy_only=False)

    return pa.table(
        {
            id_col: ids,
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
            "keep_doc": pa.array((~bad_doc).astype(I64), pa.int64()),
            "clean_text": clean,
        }
    )


def c4_line_filter(
    ds: Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> Dataset:
    """C4-style line cleaning over a (id, text) dataset."""
    return ds.map_batches(
        lambda t: c4_line_filter_batch(t, id_col, text_col), batch_format="pyarrow"
    )
