"""URL canonicalization: pure regex normalization of a url column.

The M7/M8 path→id + unit-conversion surface (``cli/Resolve.java``,
``util/Key.java`` canonical-format coercion) applied to the web-text
key: crawls carry the SAME page under syntactically different urls
(tracking params, fragments, default ports, trailing '?'), and
canonicalizing BEFORE any url-keyed stage (snapshot keep-latest, exact
url dedup, per-domain stats) collapses them.

Every pass is an RE2 regex replace over the whole Arrow column
(`pc.replace_substring_regex`), and DuckDB's `regexp_replace` is RE2
too, so the SQL oracle (``url_canonical_sql``) embeds the LITERAL same
pattern strings. No case folding (a case-folding host pass would need
a per-row split that neither engine vectorizes); no per-row Python.

Pass order is part of the spec:

1. drop the fragment                      ``#.*$`` -> ''
2. drop tracking params WITH their separator (utm_*, fbclid, gclid)
3. repair the leading separator: if step 2 removed the FIRST query
   param, the url has '&' where '?' belongs and no '?' remains —
   rows without '?' get their first '&' replaced by '?' (first-only
   replace; caveat: a query-less url with a literal '&' in its path
   is altered too — '&' in a path is invalid per RFC 3986 unencoded)
4. strip a trailing '?' or '&'
5. drop default ports ':80' / ':443' before '/' or end-of-string
6. collapse duplicate slashes outside the scheme's '//'
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# global (pattern, replacement) passes around the conditional step 3 —
# the SQL mirror embeds these literal strings
URL_PASSES_PRE: list[tuple[str, str]] = [
    (r"#.*$", ""),
    (r"[?&](?:utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*", ""),
]
URL_PASSES_POST: list[tuple[str, str]] = [
    (r"[?&]+$", ""),
    (r":80(/|$)", r"\1"),
    (r":443(/|$)", r"\1"),
    (r"([^:/])//+", r"\1/"),
]


def canonical_url_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized url column -> canonical url column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    s = pc.cast(col, pa.string())
    for pat, rep in URL_PASSES_PRE:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    # step 3: first-only '&' -> '?' on rows that lost their '?'
    repaired = pc.replace_substring_regex(
        s, pattern="&", replacement="?", max_replacements=1
    )
    s = pc.if_else(pc.match_substring(s, "?"), s, repaired)
    for pat, rep in URL_PASSES_POST:
        s = pc.replace_substring_regex(s, pattern=pat, replacement=rep)
    return s


def canonicalize_urls(
    ds: Dataset, url_col: str = "url", out_col: str = "canonical_url"
) -> Dataset:
    """Append the canonical form of ``url_col`` as ``out_col``."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return t
        return t.append_column(out_col, canonical_url_column(t.column(url_col)))

    return ds.map_batches(fn, batch_format="pyarrow")


def _sq(s: str) -> str:
    return s.replace("'", "''")


def url_canonical_sql(col: str) -> str:
    """The identical pass chain as one nested DuckDB expression.
    regexp_replace without 'g' is first-only in DuckDB — exactly the
    step-3 semantics; backrefs are \\1 on both sides (RE2)."""
    expr = col
    for pat, rep in URL_PASSES_PRE:
        expr = f"regexp_replace({expr}, '{_sq(pat)}', '{_sq(rep)}', 'g')"
    expr = (
        f"CASE WHEN contains({expr}, '?') THEN {expr} "
        f"ELSE regexp_replace({expr}, '&', '?') END"
    )
    for pat, rep in URL_PASSES_POST:
        expr = f"regexp_replace({expr}, '{_sq(pat)}', '{_sq(rep)}', 'g')"
    return expr
