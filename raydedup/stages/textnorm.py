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


def normalized_dup_pairs(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Exact duplicates MODULO normalization: (a, b) pairs where a is
    the min-id member of each group sharing identical NORMALIZED text
    and b the other members — catches trivially-reformatted copies
    (typographic variants, ragged whitespace, control junk) that the
    byte-exact sha pass misses, without paying the near-dup pipeline.

    Scale shape: a stateless normalize+hash pass (no strings leave the
    batch), ONE hash exchange groups equal norm-hashes, each bucket
    emits (min id, other id) rows. Output is O(dup docs) — the report
    surface. Hash equality stands in for string equality (engine-wide
    accepted collision class); the SQL mirror partitions on the literal
    normalized string.
    """
    import numpy as np

    from raydedup.hashing import hash_strings_u64
    from raydedup.stages.exchange import hash_exchange_apply

    partial_schema = pa.schema([("h", pa.int64()), ("id", pa.int64())])
    out_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return partial_schema.empty_table()
        norm = normalize_text_column(pc.fill_null(t.column(text_col), ""))
        h = hash_strings_u64(norm.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "h": pa.array(h.view(np.int64), pa.int64()),
                "id": pc.cast(t.column(id_col), pa.int64()),
            }
        )

    def bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return out_schema.empty_table()
        h = t.column("h").to_numpy(zero_copy_only=False)
        i = t.column("id").to_numpy(zero_copy_only=False)
        order = np.lexsort((i, h))
        h, i = h[order], i[order]
        new = np.empty(h.shape[0], dtype=bool)
        new[0] = True
        new[1:] = h[1:] != h[:-1]
        starts = np.flatnonzero(new)
        runs = np.diff(np.append(starts, h.shape[0]))
        a = np.repeat(i[starts], runs)
        keep = a != i
        return pa.table(
            {"a": pa.array(a[keep], pa.int64()), "b": pa.array(i[keep], pa.int64())}
        )

    agg = hash_exchange_apply(ds.map_batches(part, batch_format="pyarrow"), "h", bucket)
    if agg.num_rows == 0:
        return out_schema.empty_table()
    import numpy as np

    a = agg.column("a").to_numpy(zero_copy_only=False)
    b = agg.column("b").to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    return pa.table(
        {"a": pa.array(a[order], pa.int64()), "b": pa.array(b[order], pa.int64())}
    )
