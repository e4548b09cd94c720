"""Line-level boilerplate dedup tests: naive reference, planted
boilerplate lines, empty-line preservation, intra-doc repeats,
non-ASCII, degenerate docs, and partition invariance."""

from __future__ import annotations

import numpy as np
import pytest


def _naive_hot(texts: list[str], min_docs: int) -> dict[str, int]:
    from collections import Counter

    c: Counter[str] = Counter()
    for t in texts:
        c.update({l for l in t.split("\n") if l != ""})
    return {l: n for l, n in c.items() if n >= min_docs}


def _naive_dedup(texts: list[str], min_docs: int):
    hot = set(_naive_hot(texts, min_docs))
    out = []
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [l for l in lines if l not in hot]
        out.append((i, "\n".join(kept), len(lines), len(lines) - len(kept)))
    return out


def _docs_ds(texts: list[str], n_blocks: int = 1):
    import pyarrow as pa
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


BOILER = "subscribe to our newsletter"
FOOTER = "© 2026 example corp · all rights reserved"  # non-ASCII boilerplate


@pytest.fixture(scope="module")
def texts():
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(60)]
    out = []
    for i in range(80):
        body_lines = [
            " ".join(rng.choice(vocab, size=8)) for _ in range(rng.integers(1, 5))
        ]
        if i % 4 == 0:  # 20 docs carry the planted boilerplate line
            body_lines.insert(0, BOILER)
        if i % 5 == 0:  # 16 docs carry the non-ASCII footer
            body_lines.append(FOOTER)
        if i % 10 == 0:  # empty lines are structure, never boilerplate
            body_lines.insert(1, "")
        out.append("\n".join(body_lines))
    out.append("")  # empty doc
    out.append("\n\n")  # only empty lines
    out.append(BOILER + "\n" + BOILER)  # intra-doc repeat of a hot line
    out.append("unique single line doc")
    return out


def _dedup_rows(ds):
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return list(zip(df.doc_id, df.text, df.n_lines, df.n_removed))


def test_hot_lines_matches_naive(ray_session, texts):
    from raydedup.stages.lines import hot_lines

    got = hot_lines(_docs_ds(texts), min_docs=2)
    got_map = dict(zip(got.column("line").to_pylist(), got.column("n_docs").to_pylist()))
    assert got_map == _naive_hot(texts, min_docs=2)
    assert got_map[BOILER] == 21  # 20 planted + the intra-doc-repeat doc
    assert got_map[FOOTER] == 16
    assert "" not in got_map
    # ordering: n_docs DESC, line ASC
    nd = got.column("n_docs").to_pylist()
    assert nd == sorted(nd, reverse=True)


def test_dedup_lines_matches_naive(ray_session, texts):
    from raydedup.stages.lines import dedup_lines

    got = _dedup_rows(dedup_lines(_docs_ds(texts), min_docs=2))
    want = _naive_dedup(texts, min_docs=2)
    assert got == want
    by_id = {r[0]: r for r in got}
    # boilerplate stripped everywhere, body survives
    assert BOILER not in by_id[0][1] and by_id[0][3] >= 1
    # intra-doc repeat: both occurrences removed -> empty text
    rep = len(texts) - 2
    assert by_id[rep][1] == "" and by_id[rep][3] == 2
    # empty doc and empty-lines doc pass through untouched
    assert by_id[len(texts) - 4] == (len(texts) - 4, "", 1, 0)
    assert by_id[len(texts) - 3] == (len(texts) - 3, "\n\n", 3, 0)


def test_min_docs_gate(ray_session):
    from raydedup.stages.lines import dedup_lines, hot_lines

    texts = ["a\nb", "a\nc", "a\nd"]
    assert hot_lines(_docs_ds(texts), min_docs=4).num_rows == 0
    got = _dedup_rows(dedup_lines(_docs_ds(texts), min_docs=4))
    assert got == [(0, "a\nb", 2, 0), (1, "a\nc", 2, 0), (2, "a\nd", 2, 0)]


def test_partition_invariance(ray_session, texts):
    from raydedup.stages.lines import dedup_lines, hot_lines

    a = hot_lines(_docs_ds(texts, n_blocks=1), min_docs=3)
    b = hot_lines(_docs_ds(texts, n_blocks=7), min_docs=3)
    assert a.to_pydict() == b.to_pydict()
    da = _dedup_rows(dedup_lines(_docs_ds(texts, n_blocks=1), min_docs=3))
    db = _dedup_rows(dedup_lines(_docs_ds(texts, n_blocks=7), min_docs=3))
    assert da == db
