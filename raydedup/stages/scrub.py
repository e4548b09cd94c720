"""PII / pattern scrubbing over string columns: scan, redact, extract.

The training-data hygiene pass the reference's per-resource extract
stage (`strategy/olaf/OlafStrategy.java:208-217` decode + normalize)
implies for web text: find personally-identifying patterns, replace
them with placeholders, and pull typed fields out of semi-structured
metadata strings.

All three operators are stateless row-local ``map_batches`` passes —
they stream at any scale, shuffle nothing, and do all matching inside
Arrow's RE2 kernels (`count_substring_regex`, `replace_substring_regex`,
`extract_regex`): no per-row Python. RE2 is also DuckDB's regex engine,
which is what makes the driver's SQL oracle bit-exact on counts,
replacements and captures.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

# Default PII pattern set. RE2-safe (no backrefs / lookaround), verified
# to count and replace identically under pyarrow.compute and DuckDB.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\-\s]{6,}[0-9]",
}

# Redaction rules: pattern -> placeholder, applied in dict order
# (order matters: e.g. emails must be replaced before bare numbers).
PII_REDACTIONS: dict[str, tuple[str, str]] = {
    "email": (PII_PATTERNS["email"], "<EMAIL>"),
    "ipv4": (PII_PATTERNS["ipv4"], "<IP>"),
    "number": (r"[0-9]+", "<NUM>"),
}


def scan_patterns(
    ds: Dataset,
    *,
    key_col: str,
    text_col: str,
    patterns: dict[str, str] | None = None,
) -> Dataset:
    """(key, text) -> (key, n_<name>... per pattern, has_match).

    One int64 occurrence count per named pattern, non-overlapping
    left-to-right RE2 semantics. ``has_match`` is true when any pattern
    fired. Stateless single pass; nulls count as 0 matches.
    """
    pats = dict(patterns if patterns is not None else PII_PATTERNS)
    if not pats:
        raise ValueError("scan_patterns needs at least one pattern")
    names = list(pats)
    schema = pa.schema(
        [(key_col, pa.int64())]
        + [(f"n_{n}", pa.int64()) for n in names]
        + [("has_match", pa.bool_())]
    )

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return schema.empty_table()
        text = pc.fill_null(t.column(text_col), "")
        cols: list[pa.Array] = [t.column(key_col).cast(pa.int64())]
        total = np.zeros(t.num_rows, dtype=np.int64)
        for n in names:
            c = pc.count_substring_regex(text, pats[n]).cast(pa.int64())
            total += c.to_numpy(zero_copy_only=False)
            cols.append(c)
        cols.append(pa.array(total > 0, type=pa.bool_()))
        return pa.table(cols, schema=schema)

    return ds.select_columns([key_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def redact_patterns(
    ds: Dataset,
    *,
    key_col: str,
    text_col: str,
    rules: dict[str, tuple[str, str]] | None = None,
    out_col: str = "redacted",
) -> Dataset:
    """(key, text) -> (key, <out_col>) with every rule's matches replaced
    by its placeholder, rules applied in order on the running result
    (so earlier placeholders are not re-matched by later rules as long
    as placeholders don't match the patterns — the defaults don't).
    """
    rs = list((rules if rules is not None else PII_REDACTIONS).values())
    if not rs:
        raise ValueError("redact_patterns needs at least one rule")
    schema = pa.schema([(key_col, pa.int64()), (out_col, pa.string())])

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return schema.empty_table()
        text = pc.fill_null(t.column(text_col), "")
        for pat, repl in rs:
            text = pc.replace_substring_regex(text, pat, repl)
        return pa.table(
            [t.column(key_col).cast(pa.int64()), text.cast(pa.string())],
            schema=schema,
        )

    return ds.select_columns([key_col, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )


def extract_int_field(
    ds: Dataset,
    *,
    key_col: str,
    text_col: str,
    pattern: str,
    group: str,
    out_col: str = "value",
    carry: tuple[str, ...] = (),
) -> Dataset:
    """(key, text) -> (key, *carry, <out_col>: int64 or null) capturing
    one named RE2 group per row (first match). Rows where the pattern
    does not match yield null — callers filter or coalesce downstream.
    ``carry`` columns pass through untouched (grouping keys etc.), so a
    downstream aggregate needs no join back to the source.

    This is the metadata-JSON field pull (`props -> $.k`) done as a
    regex capture so the same single streaming pass works on any
    semi-structured string column, not only valid JSON.
    """

    def kernel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = [t.column(key_col).cast(pa.int64())]
        names = [key_col]
        for c in carry:
            cols.append(t.column(c))
            names.append(c)
        text = pc.fill_null(t.column(text_col), "")
        ex = pc.extract_regex(text, pattern)
        cols.append(pc.cast(pc.struct_field(ex, group), pa.int64()))
        names.append(out_col)
        return pa.table(cols, names=names)

    return ds.select_columns([key_col, *carry, text_col]).map_batches(
        kernel, batch_format="pyarrow"
    )
