"""gopher_rules / c4_line_filter vs pure-Python per-row references."""

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.stages.qualityfilter import (
    BULLET_RE,
    C4_BAD_DOC_MARKERS,
    C4_BAD_LINE_MARKERS,
    C4_MIN_LINE_WORDS,
    C4_TERMINAL_RE,
    ELLIPSIS_RE,
    GOPHER_ALPHA_DEN,
    GOPHER_ALPHA_NUM,
    GOPHER_BULLET_DEN,
    GOPHER_BULLET_NUM,
    GOPHER_ELLIPSIS_DEN,
    GOPHER_ELLIPSIS_NUM,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_STOPWORDS,
    GOPHER_MIN_WORDS,
    GOPHER_MWL_MAX,
    GOPHER_MWL_MIN,
    GOPHER_STOPWORDS,
    c4_line_filter,
    c4_line_filter_batch,
    gopher_rules,
    gopher_rules_batch,
)

TRICKY = [
    "• nav home\nthe quick brown fox jumps over that lazy dog and it is "
    "all of it to be have with extra words here to cross twenty total.",
    "short doc...",
    "a b c\nenable javascript and cookies to continue\nsee also part 7.",
    "",
    "   \n  ",
    "numbers 1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18 19 20 21.",
    'he said "stop"\nlorem ipsum dolor { x }',
    "tab\tsep words only\nok line here.",
    "- bullet one...\n* bullet two...\n- bullet three...",
    "ends with ellipsis line...\nand a normal line here ok.",
    "ACCEPT our COOKIE policy!\nreal content line stays here fine.",
]


def _words(text: str) -> list[str]:
    t = text.strip()
    return t.split() if t else []


def _ref_gopher_row(doc_id: int, text: str) -> dict:
    words = _words(text)
    lines = text.split("\n")
    n_words = len(words)
    word_chars = len(re.sub(r"\s", "", text))
    n_alpha = sum(1 for w in words if re.search("[a-zA-Z]", w))
    low = {w.lower() for w in words}
    n_stop = sum(1 for sw in GOPHER_STOPWORDS if sw in low)
    n_lines = len(lines)
    n_bullet = sum(1 for l in lines if re.search(BULLET_RE, l))
    n_ellipsis = sum(1 for l in lines if re.search(ELLIPSIS_RE, l))
    words_ok = GOPHER_MIN_WORDS <= n_words <= GOPHER_MAX_WORDS
    mwl_ok = (
        GOPHER_MWL_MIN * n_words <= word_chars <= GOPHER_MWL_MAX * n_words
    )
    alpha_ok = GOPHER_ALPHA_DEN * n_alpha >= GOPHER_ALPHA_NUM * n_words
    stop_ok = n_stop >= GOPHER_MIN_STOPWORDS
    bullet_ok = GOPHER_BULLET_DEN * n_bullet < GOPHER_BULLET_NUM * n_lines
    ellipsis_ok = (
        GOPHER_ELLIPSIS_DEN * n_ellipsis < GOPHER_ELLIPSIS_NUM * n_lines
    )
    keep = all([words_ok, mwl_ok, alpha_ok, stop_ok, bullet_ok, ellipsis_ok])
    return {
        "doc_id": doc_id,
        "n_words": n_words,
        "word_chars": word_chars,
        "n_alpha_words": n_alpha,
        "n_stopwords": n_stop,
        "n_lines": n_lines,
        "n_bullet_lines": n_bullet,
        "n_ellipsis_lines": n_ellipsis,
        "words_ok": int(words_ok),
        "mwl_ok": int(mwl_ok),
        "alpha_ok": int(alpha_ok),
        "stop_ok": int(stop_ok),
        "bullet_ok": int(bullet_ok),
        "ellipsis_ok": int(ellipsis_ok),
        "keep": int(keep),
    }


def _ref_c4_row(doc_id: int, text: str) -> dict:
    lines = text.split("\n")
    kept = [
        l
        for l in lines
        if len(_words(l)) >= C4_MIN_LINE_WORDS
        and re.search(C4_TERMINAL_RE, l)
        and not any(m in l.lower() for m in C4_BAD_LINE_MARKERS)
    ]
    bad = any(m in text.lower() for m in C4_BAD_DOC_MARKERS)
    return {
        "doc_id": doc_id,
        "n_lines": len(lines),
        "n_kept": len(kept),
        "keep_doc": int(not bad),
        "clean_text": "\n".join(kept),
    }


def _rand_corpus(n: int = 800) -> list[str]:
    rng = np.random.default_rng(77)
    vocab = [
        "the", "a", "and", "of", "to", "data", "spark", "merge", "x9",
        "1", "42", "...", "-", "•", "cookie", "{", "lorem", "ipsum",
    ]
    seps = np.array([" ", " ", " ", "\n", "\t"])
    out = []
    for _ in range(n):
        k = int(rng.integers(0, 40))
        toks = rng.choice(vocab, size=k)
        sep = rng.choice(seps, size=max(k - 1, 0))
        parts = []
        for i, tk in enumerate(toks):
            parts.append(tk)
            if i < len(sep):
                parts.append(sep[i])
        out.append("".join(parts))
    return out


@pytest.mark.parametrize("texts", [TRICKY, _rand_corpus()])
def test_gopher_batch_matches_reference(texts):
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = gopher_rules_batch(t).to_pandas()
    ref = pd.DataFrame([_ref_gopher_row(i, s) for i, s in enumerate(texts)])
    pd.testing.assert_frame_equal(got, ref[got.columns], check_dtype=False)


@pytest.mark.parametrize("texts", [TRICKY, _rand_corpus()])
def test_c4_batch_matches_reference(texts):
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = c4_line_filter_batch(t).to_pandas()
    ref = pd.DataFrame([_ref_c4_row(i, s) for i, s in enumerate(texts)])
    pd.testing.assert_frame_equal(got, ref[got.columns], check_dtype=False)


def test_dataset_wrappers_partition_invariant(ray_session):
    texts = TRICKY * 40
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    for nparts in (1, 7):
        ds = rd.from_pandas(df).repartition(nparts)
        g = gopher_rules(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
        c = (
            c4_line_filter(ds)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        ref_g = pd.DataFrame(
            [_ref_gopher_row(i, s) for i, s in enumerate(texts)]
        )
        ref_c = pd.DataFrame([_ref_c4_row(i, s) for i, s in enumerate(texts)])
        pd.testing.assert_frame_equal(g, ref_g[g.columns], check_dtype=False)
        pd.testing.assert_frame_equal(c, ref_c[c.columns], check_dtype=False)
