"""General deterministic HTML -> text extraction (readability-lite).

The reference's decode front-end accepts ARBITRARY containers and
canonicalizes them (ffmpeg pipe resampling any input to 16 kHz mono
PCM, ``util/Key.java:85``, ``cli/Panako.java:106-114``). The web-text
analog: a pure deterministic function of the raw ``html`` bytes that
works on any page, not just the synthetic corpus template.

Extraction spec (applied in this exact order; both implementations
below share the literal pattern strings, so the vectorized Arrow/RE2
path and the per-row Python path agree byte-for-byte):

1. decode bytes as UTF-8 (``errors="replace"``)
2. drop HTML comments
3. drop non-content elements WITH their content (script, style, head,
   iframe, ...) — one pass per tag name (RE2 has no backreferences,
   and a single alternation could cross-close mixed content); dropped
   spans leave ONE SPACE so removals can never splice the surrounding
   characters into a new tag (which would make pass order observable
   in new ways) — the space collapses in step 7
4. scope to the main content: first ``<main>``, else first
   ``<article>``, else ``<body>``, else the whole document
5. drop boilerplate containers WITH content (nav, header, footer,
   aside, form) — handles the nested-nav-inside-main case
6. ``<br>`` and block-level element tags become newlines; all other
   tags are removed
7. whitespace canonicalization: runs of spaces/tabs/CR collapse to one
   space, spaces around newlines drop, 3+ newlines collapse to two,
   ASCII-whitespace trim at both ends
8. HTML entities decode last (``html.unescape``), only on rows that
   still contain ``&`` — so decoded ``&lt;`` can never be re-parsed
   as a tag

The synthetic corpus renderer (``raydedup.corpus.render_html``) puts
whitespace-canonical escaped text inside ``<main>``, so the north-star
per-row invariant ``extract(html) == text`` holds byte-identically on
every corpus page (steps 4/7/8 are exact inverses there); the same
function handles arbitrary real pages.
"""

from __future__ import annotations

import html as _htmllib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- shared pattern spec (literal strings, compiled by re AND RE2) ---------

# elements whose CONTENT is dropped too
_STRIP_TAGS = [
    "script", "style", "noscript", "template", "svg", "head",
    "iframe", "object", "canvas", "audio", "video", "select",
    "button", "textarea",
]
# boilerplate containers dropped (with content) from the scoped body
_BOILER_TAGS = ["nav", "header", "footer", "aside", "form"]
# content scope preference order
_SCOPE_TAGS = ["main", "article", "body"]
# elements whose boundaries become newlines
_BLOCK_TAGS = (
    "p|div|h1|h2|h3|h4|h5|h6|li|ul|ol|table|thead|tbody|tfoot|tr|td|th"
    "|caption|section|article|main|blockquote|pre|figure|figcaption"
    "|dl|dt|dd|hr|address|details|summary|fieldset|legend"
)

_COMMENT_PAT = r"(?s)<!--.*?-->"


def _strip_pat(tag: str) -> str:
    return rf"(?is)<{tag}\b[^>]*>.*?</{tag}\s*>"


def _scope_pat(tag: str) -> str:
    return rf"(?is)<{tag}\b[^>]*>(?P<c>.*?)</{tag}\s*>"


_BR_PAT = r"(?i)<br\s*/?>"
_BLOCK_PAT = rf"(?i)</?(?:{_BLOCK_TAGS})\b[^>]*>"
_TAG_PAT = r"<[^>]*>"
# (pattern, replacement) in order; [^>]* and the classes below match \n
# without (?s), identically in re and RE2
_WS_PATS = [
    (r"[ \t\r\f\v]+", " "),
    (r" ?\n ?", "\n"),
    (r"\n{3,}", "\n\n"),
]
_TRIM_CHARS = " \t\r\n\f\v"

# --- per-row Python reference implementation --------------------------------

_COMMENT_RE = re.compile(_COMMENT_PAT)
_STRIP_RES = [re.compile(_strip_pat(t)) for t in _STRIP_TAGS]
_SCOPE_RES = [re.compile(_scope_pat(t)) for t in _SCOPE_TAGS]
_BOILER_RES = [re.compile(_strip_pat(t)) for t in _BOILER_TAGS]
_BR_RE = re.compile(_BR_PAT)
_BLOCK_RE = re.compile(_BLOCK_PAT)
_TAG_RE = re.compile(_TAG_PAT)
_WS_RES = [(re.compile(p), r) for p, r in _WS_PATS]


def extract_text_from_html(html: bytes | str | None) -> str:
    """Pure function html -> canonical text (the spec above). The
    per-row reference the vectorized column path must agree with."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _COMMENT_RE.sub(" ", s)
    for rx in _STRIP_RES:
        s = rx.sub(" ", s)
    for rx in _SCOPE_RES:
        m = rx.search(s)
        if m is not None:
            s = m.group("c")
            break
    for rx in _BOILER_RES:
        s = rx.sub(" ", s)
    s = _BR_RE.sub("\n", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    for rx, rep in _WS_RES:
        s = rx.sub(rep, s)
    s = s.strip(_TRIM_CHARS)
    if "&" in s:
        s = _htmllib.unescape(s)
    return s


# --- vectorized Arrow implementation ----------------------------------------


def _any_ci(s: pa.Array, needle: str) -> bool:
    """Does any row contain ``needle`` (case-insensitive)? A plain
    substring scan — far cheaper than the regex pass it gates."""
    return bool(
        pc.any(pc.match_substring(s, needle, ignore_case=True)).as_py()
    )


def _sub(s: pa.Array, pat: str, rep: str) -> pa.Array:
    return pc.replace_substring_regex(s, pattern=pat, replacement=rep)


# combined presence triggers: ONE regex scan decides whether a whole
# pass group can be skipped (a skipped pass is an identity — the
# pattern matches nowhere, and since every drop leaves a space, no
# pass can ever CREATE a new tag occurrence — so gating is sound).
# head is gated separately (present on ~every real page); the groups
# are split around it because pass ORDER is part of the spec
# (overlapping unbalanced spans resolve by whichever pass runs first).
_head_i = _STRIP_TAGS.index("head")
_STRIP_PRE = _STRIP_TAGS[:_head_i]
_STRIP_POST = _STRIP_TAGS[_head_i + 1 :]
_PRE_TRIGGER = r"(?i)<(?:" + "|".join(_STRIP_PRE) + r")"
_POST_TRIGGER = r"(?i)<(?:" + "|".join(_STRIP_POST) + r")"
_BOILER_TRIGGER = r"(?i)<(?:" + "|".join(_BOILER_TAGS) + r")"
# identity conditions for the three whitespace passes, as LITERAL
# substring lists (any hit -> the pass must run): plain memmem scans
# beat the equivalent regex alternation ~5x on the trigger checks,
# which on canonical-whitespace corpora are the only cost the ws
# passes have
_WS_TRIGGERS = [
    ["\t", "\r", "\f", "\v", "  "],
    [" \n", "\n "],
    ["\n\n\n"],
]


def _any_re(s: pa.Array, pat: str) -> bool:
    return bool(pc.any(pc.match_substring_regex(s, pat)).as_py())


def _any_sub_of(s: pa.Array, needles: list[str]) -> bool:
    return any(
        bool(pc.any(pc.match_substring(s, n)).as_py()) for n in needles
    )


def extract_text_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized html (binary) column -> extracted text (string) column.

    Every pass is an Arrow C++ kernel over the whole column (RE2);
    pass groups whose trigger substring appears nowhere in the column
    are skipped (a skipped pass is an identity, so this never changes
    the result). Scoping avoids RE2 capture groups (the slow NFA
    machine): a capture-free full-pattern match picks the rows, two
    capture-free replaces cut prefix/suffix, ``if_else`` merges.
    Python is entered only for (a) batches containing invalid UTF-8 —
    the whole batch falls back to the per-row reference — and (b) the
    entity-unescape of rows that still contain ``&``.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, b"" if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type) else "")
    try:
        s = pc.cast(col, pa.string())
    except pa.ArrowInvalid:
        # invalid UTF-8 somewhere in the batch: per-row reference path
        # (errors="replace" decode), identical spec
        return pa.array(
            [extract_text_from_html(h) for h in col.to_pylist()], type=pa.string()
        )

    if _any_ci(s, "<!--"):
        s = _sub(s, _COMMENT_PAT, " ")
    if _any_re(s, _PRE_TRIGGER):
        for tag in _STRIP_PRE:
            if _any_ci(s, f"<{tag}"):
                s = _sub(s, _strip_pat(tag), " ")
    if _any_ci(s, "<head"):
        s = _sub(s, _strip_pat("head"), " ")
    if _any_re(s, _POST_TRIGGER):
        for tag in _STRIP_POST:
            if _any_ci(s, f"<{tag}"):
                s = _sub(s, _strip_pat(tag), " ")

    # scope to main/article/body: per row, the FIRST tag (in preference
    # order) whose full open..close pattern matches — same row semantics
    # as the reference implementation's ordered re.search
    done = None
    for tag in _SCOPE_TAGS:
        if done is not None and bool(pc.all(done).as_py()):
            break
        if not _any_ci(s, f"<{tag}"):
            continue
        has = pc.match_substring_regex(s, _strip_pat(tag))
        take = has if done is None else pc.and_(has, pc.invert(done))
        if not bool(pc.any(take).as_py()):
            done = has if done is None else pc.or_(done, has)
            continue
        cut = _sub(s, rf"(?is)^.*?<{tag}\b[^>]*>", "")
        cut = _sub(cut, rf"(?is)</{tag}\s*>.*$", "")
        s = pc.if_else(take, cut, s)
        done = take if done is None else pc.or_(done, take)

    if _any_ci(s, "<"):
        if _any_re(s, _BOILER_TRIGGER):
            for tag in _BOILER_TAGS:
                if _any_ci(s, f"<{tag}"):
                    s = _sub(s, _strip_pat(tag), " ")
        if _any_ci(s, "<br"):
            s = _sub(s, _BR_PAT, "\n")
        s = _sub(s, _BLOCK_PAT, "\n")
        s = _sub(s, _TAG_PAT, "")
    for (pat, rep), trig in zip(_WS_PATS, _WS_TRIGGERS):
        if _any_sub_of(s, trig):
            s = _sub(s, pat, rep)
    s = pc.utf8_trim(s, _TRIM_CHARS)

    amp = pc.match_substring(s, "&")
    if bool(pc.any(amp).as_py()):
        mask = amp.to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(mask)
        fixed = pa.array(
            [_htmllib.unescape(v) for v in s.take(pa.array(idx)).to_pylist()],
            type=s.type,
        )
        try:
            s = pc.replace_with_mask(s, amp, fixed)
        except pa.ArrowNotImplementedError:
            vals = s.to_pylist()
            for i, v in zip(idx.tolist(), fixed.to_pylist()):
                vals[i] = v
            s = pa.array(vals, type=s.type)
    return s
