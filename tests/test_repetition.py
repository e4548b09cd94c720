"""Intra-doc repetition-signal tests: naive reference, planted
repetition, degenerate docs, non-ASCII routing, partition invariance,
and the Arrow/DuckDB line-split edge agreement."""

from __future__ import annotations

import numpy as np
import pytest


def _naive(text: str) -> dict[str, float]:
    """Pure-Python reference of repetition_batch's per-doc columns."""
    lines = text.split("\n")
    nl, dl = len(lines), len(set(lines))
    words = text.lower().split()
    nt, dt = len(words), len(set(words))
    g2 = [" ".join(words[i : i + 2]) for i in range(len(words) - 1)]
    g3 = [" ".join(words[i : i + 3]) for i in range(len(words) - 2)]
    from collections import Counter

    c2 = Counter(g2)
    return {
        "n_lines": nl,
        "dup_line_frac": (nl - dl) / nl,
        "dup_word_frac": (nt - dt) / nt if nt else 0.0,
        "dup_2gram_frac": (len(g2) - len(set(g2))) / len(g2) if g2 else 0.0,
        "dup_3gram_frac": (len(g3) - len(set(g3))) / len(g3) if g3 else 0.0,
        "top_2gram_frac": max(c2.values()) / len(g2) if g2 else 0.0,
    }


def _run(texts: list[str], n_blocks: int = 1):
    import pyarrow as pa
    import ray.data as rd

    from raydedup.stages.textstats import repetition_batch

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    ds = rd.from_arrow(tbl)
    if n_blocks > 1:
        ds = ds.repartition(n_blocks)
    out = ds.map_batches(repetition_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


TEXTS = [
    "the cat sat on the mat the cat sat again",  # repeated words + 2/3-grams
    "a b a b a b a b",  # heavy bigram repetition
    "alpha beta gamma delta",  # all distinct
    "same line\nsame line\nother line",  # duplicate lines
    "",  # empty: one empty line, zero tokens
    "solo",  # single token: no grams
    "x\ny\n",  # trailing newline -> trailing empty line element
    "naïve naïve schön naïve exposé schön",  # non-ASCII slow path
    "Mixed CASE mixed case MIXED case",  # lowering folds these together
]


def test_matches_naive_reference(ray_session):
    df = _run(TEXTS)
    for i, t in enumerate(TEXTS):
        want = _naive(t)
        row = df.iloc[i]
        for k, v in want.items():
            assert row[k] == v, (i, k, row[k], v)


def test_planted_values(ray_session):
    df = _run(TEXTS)
    r = df.iloc[1]  # "a b a b a b a b": 7 bigrams, 2 distinct, top "a b" x4
    assert r.dup_2gram_frac == 5 / 7 and r.top_2gram_frac == 4 / 7
    assert df.iloc[3].dup_line_frac == 1 / 3 and df.iloc[3].n_lines == 3
    assert df.iloc[4].n_lines == 1 and df.iloc[4].dup_word_frac == 0.0
    assert df.iloc[5].dup_2gram_frac == 0.0 and df.iloc[5].top_2gram_frac == 0.0
    # trailing newline: ["x","y",""] -> 3 lines, all distinct
    assert df.iloc[6].n_lines == 3 and df.iloc[6].dup_line_frac == 0.0
    # non-ASCII doc routed through the per-doc path, same formulas
    assert df.iloc[7].dup_word_frac == 3 / 6
    assert df.iloc[8].dup_word_frac == (6 - 2) / 6


def test_partition_invariance(ray_session):
    a = _run(TEXTS, n_blocks=1)
    b = _run(TEXTS, n_blocks=5)
    assert a.equals(b)


def test_line_split_matches_duckdb(ray_session):
    """Arrow split_pattern and DuckDB string_split must agree on the
    edges the line metric depends on (empty doc, trailing newline)."""
    import duckdb

    for t in ["", "x\ny\n", "\n", "a\n\na"]:
        got = duckdb.execute(
            "SELECT string_split(?, chr(10))", [t]
        ).fetchone()[0]
        assert got == t.split("\n")
    df = _run(["", "x\ny\n", "\n", "a\n\na"])
    assert df.n_lines.tolist() == [1, 3, 2, 3]


def test_oracle_sql_matches_kernel_on_edge_whitespace(ray_session):
    """The DuckDB oracle must agree with the engine on docs with
    leading/trailing tabs/newlines (DuckDB's 1-arg trim strips spaces
    only — oracle_sql() rewrites every trim with the explicit
    whitespace set)."""
    import duckdb
    import pyarrow as pa

    import __ray_entry__ as entry
    from raydedup.stages.textstats import repetition_batch

    texts = ["x\ny\n", "\talpha beta\t", "\n\n", "a b a\r\n", " plain spaces "]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(entry.oracle_sql()["repetition_scores"]).df()
    got = (
        repetition_batch(tbl)
        .select(list(want.columns))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in want.columns:
        assert (got[c].values == want[c].values).all(), c


def test_script_profile_counts(ray_session):
    """script_profile: exact disjoint class counts on mixed-script docs,
    other bucket catches what no class claims, ratio is count/chars."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydedup.stages.textstats import script_profile

    texts = [
        "Hello 123 мир",     # 5 ascii, 3 digit, 2 space, 3 cyrillic
        "漢字 test",          # 2 han, 4 ascii, 1 space
        "",                   # all zero
        "¡señor café!",       # non-ASCII latin chars land in other
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
    )
    df = script_profile(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(df.n_ascii_alpha) == [5, 4, 0, 7]
    assert list(df.n_digit) == [3, 0, 0, 0]
    assert list(df.n_cyrillic) == [3, 0, 0, 0]
    assert list(df.n_han) == [0, 2, 0, 0]
    assert list(df.n_other) == [0, 0, 0, 4]  # ¡ ñ é !
    total = (
        df.n_ascii_alpha + df.n_digit + df.n_space
        + df.n_han + df.n_cyrillic + df.n_arabic + df.n_other
    )
    assert (total == df.n_chars).all()
    np.testing.assert_allclose(
        df.other_ratio, df.n_other / np.maximum(df.n_chars, 1)
    )
