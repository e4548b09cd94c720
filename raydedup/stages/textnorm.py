"""Text normalization: pure regex cleanup of a text column.

The M8 unit-conversion / canonical-format surface (``util/Key.java``
coercing every input to one sample rate before fingerprinting) applied
to web text: crawls carry typographic variants of the SAME content
(curly vs straight quotes, unicode dashes/ellipses, NBSP and zero-width
characters, stray control bytes, ragged whitespace), and normalizing
BEFORE shingling/MinHash collapses spurious near-dup misses exactly
like resampling collapses sample-rate variants.

Every pass is an RE2 regex replace over the whole Arrow column
(``pc.replace_substring_regex``), and DuckDB's ``regexp_replace`` is
RE2 too, so the SQL oracle embeds the LITERAL same pattern strings
(``text_normalize_sql``). Unicode characters appear as literals in the
patterns — both engines receive identical UTF-8 bytes. No per-row
Python; the stage is stateless, row-local, and streams.

Pass order is part of the spec:

1.  strip control chars except tab/newline  ``[\\x00-\\x08\\x0b-\\x1f\\x7f]``
2.  strip zero-width chars (ZWSP/ZWNJ/ZWJ/BOM)
3.  NBSP -> plain space
4.  curly single quotes -> ``'``
5.  curly double quotes / guillemets -> ``"``
6.  en/em/horizontal-bar dashes -> ``-``
7.  unicode ellipsis -> ``...``
8.  collapse space/tab runs -> one space
9.  trim spaces around newlines
10. collapse 3+ newlines -> 2
11. trim leading / 12. trailing whitespace
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# (pattern, replacement) passes in order — the SQL mirror embeds these
# literal strings
TEXTNORM_PASSES: list[tuple[str, str]] = [
    (r"[\x00-\x08\x0b-\x1f\x7f]", ""),
    ("[​‌‍﻿]", ""),
    (" ", " "),
    ("[‘’‚′]", "'"),
    ("[“”„«»]", '"'),
    ("[–—―]", "-"),
    ("…", "..."),
    (r"[ \t]+", " "),
    (r" *\n *", "\n"),
    (r"\n\n\n+", "\n\n"),
    (r"^\s+", ""),
    (r"\s+$", ""),
]


def normalize_text_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized text column -> normalized text column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.cast(col, pa.string())
    for pat, rep in TEXTNORM_PASSES:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    return s


def normalize_text(
    ds: Dataset, text_col: str = "text", out_col: str = "norm_text"
) -> Dataset:
    """Append the normalized form of ``text_col`` as ``out_col``."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        return t.append_column(out_col, normalize_text_column(t.column(text_col)))

    return ds.map_batches(fn, batch_format="pyarrow")


def normalized_docs(ds: Dataset, text_col: str = "text") -> Dataset:
    """Replace ``text_col`` with its normalized form IN PLACE (same
    column name, so every downstream stage — signatures, verify
    re-shingling, containment winnowing, exact sha — sees the one
    canonical text). ``text_sha256`` is recomputed when present to keep
    the exact-dup pass consistent with what the near-dup path hashes."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        norm = normalize_text_column(t.column(text_col))
        t = t.set_column(t.schema.get_field_index(text_col), text_col, norm)
        if "text_sha256" in t.column_names:
            from raydedup.stages.extract import sha256_of_utf8_array

            t = t.set_column(
                t.schema.get_field_index("text_sha256"),
                "text_sha256",
                sha256_of_utf8_array(norm),
            )
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def text_normalize_sql(col: str) -> str:
    """The identical pass chain as one nested DuckDB expression."""
    expr = col
    for pat, rep in TEXTNORM_PASSES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr
