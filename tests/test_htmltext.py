"""General HTML -> text extraction tests: real-page shapes (nested
tags, entities, no <main>, malformed markup), byte-parity between the
vectorized Arrow column kernel and the per-row Python reference, and
randomized structural parity (hypothesis)."""

from __future__ import annotations

import pyarrow as pa

from raydedup.stages.htmltext import extract_text_column, extract_text_from_html


def _both(html: bytes) -> str:
    """Run both implementations, assert byte-parity, return the text."""
    py = extract_text_from_html(html)
    vec = extract_text_column(pa.array([html], pa.binary())).to_pylist()[0]
    assert py == vec, (repr(py), repr(vec))
    return py


def test_basic_page_structure():
    out = _both(
        b"<html><head><title>T</title><meta charset='utf-8'></head>"
        b"<body><p>Hello <b>world</b></p><p>Second</p></body></html>"
    )
    assert out == "Hello world\n\nSecond"  # head dropped, inline kept, blocks break


def test_article_scope_and_boilerplate():
    out = _both(
        b"<html><body><nav>menu</nav><article><h1>Title</h1>"
        b"<p>Body &amp; more</p><aside>ads</aside></article>"
        b"<footer>copyright</footer></body></html>"
    )
    assert out == "Title\n\nBody & more"


def test_no_main_no_body_fragment():
    assert _both(b"<div>no body tag<br/>line two</div>") == "no body tag\nline two"
    assert _both(b"plain text, no tags at all") == "plain text, no tags at all"


def test_script_style_comment_stripped_case_insensitive():
    out = _both(
        b"<body><SCRIPT>var x='<p>fake</p>';</SCRIPT><p>kept</p>"
        b"<style>.a{color:red}</style><!-- c <p>ghost</p> --></body>"
    )
    assert out == "kept"


def test_nav_nested_inside_main_is_dropped():
    out = _both(b"<main><nav>inner nav</nav>content end</main>")
    assert out == "content end"


def test_entities_decode_last():
    # decoded &lt;tag&gt; must NOT be re-parsed as a tag
    out = _both(b"<main>a &lt;p&gt; b &amp; c &#65; d</main>")
    assert out == "a <p> b & c A d"


def test_whitespace_canonicalization():
    out = _both(b"<body><p>a\n   b</p>\n\n\n\n<p>c</p>\t </body>")
    assert out == "a\nb\n\nc"


def test_scope_preference_main_over_article_over_body():
    assert _both(b"<article>a1</article><main>m1</main>") == "m1"
    assert _both(b"<body>outer<article>a1</article></body>") == "a1"  # article preferred


def test_malformed_markup():
    assert _both(b"</main>stray closer<main>real</main>") == "real"
    # opener without closer: scope falls through to the next candidate
    assert _both(b"<main>open only <p>x</p>") == "open only\nx"
    assert _both(b"<body>unclosed <p>para") == "unclosed\npara"
    assert _both(b"") == ""
    assert _both(b"<main></main>") == ""


def test_invalid_utf8_batch_falls_back_consistently():
    rows = [b"\xff\xfeinvalid <body><p>x</p></body>", b"<main>ok</main>"]
    vec = extract_text_column(pa.array(rows, pa.binary())).to_pylist()
    assert vec == [extract_text_from_html(r) for r in rows]
    assert vec[1] == "ok"


def test_null_html_rows():
    vec = extract_text_column(pa.array([b"<main>x</main>", None], pa.binary()))
    assert vec.to_pylist() == ["x", ""]


def test_large_groups_vectorized_parity_on_corpus():
    from raydedup.corpus import CorpusSpec, build_corpus

    pages = build_corpus(CorpusSpec(n_docs=200, seed=99))["pages"]
    got = extract_text_column(pages.column("html")).to_pylist()
    assert got == pages.column("text").to_pylist()


def test_randomized_structural_parity():
    """Random tag soup: the two implementations must agree byte-for-byte
    on arbitrary nestings, case, entities, and whitespace."""
    import numpy as np

    rng = np.random.default_rng(2024)
    tags = ["p", "div", "span", "b", "main", "article", "body", "nav",
            "script", "style", "li", "br/", "head", "table", "td", "u"]
    words = ["alpha", "beta", "&amp;", "&lt;x&gt;", "a  b", "x\ty", "&#66;", "é☃"]
    docs = []
    for _ in range(300):
        parts = []
        for _ in range(int(rng.integers(1, 25))):
            r = rng.random()
            t = tags[int(rng.integers(0, len(tags)))]
            if r < 0.35:
                parts.append(f"<{t.upper() if rng.random() < 0.2 else t}>")
            elif r < 0.6:
                parts.append(f"</{t.rstrip('/')}>")
            elif r < 0.7:
                parts.append("<!-- comment -->")
            else:
                parts.append(words[int(rng.integers(0, len(words)))])
        docs.append(" ".join(parts).encode("utf-8"))
    vec = extract_text_column(pa.array(docs, pa.binary())).to_pylist()
    for i, (d, v) in enumerate(zip(docs, vec)):
        py = extract_text_from_html(d)
        assert py == v, (i, d, repr(py), repr(v))
