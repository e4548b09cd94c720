"""Per-host boilerplate lines: threshold arithmetic, trim semantics,
partition invariance, degenerate docs."""

import pyarrow as pa

import ray.data as rd

from raydedup.stages.hostlines import host_hot_lines, trim_host_lines

ROWS = [
    (1, "MENU\nwelcome to site a\nFOOTER", "a"),
    (2, "MENU\nanother page here\nFOOTER", "a"),
    (3, "MENU\nthird page\nother footer", "a"),
    (4, "MENU\nunrelated site\nFOOTER", "b"),   # below b's fraction
    (5, "hello\n\nworld", "b"),
    (6, "", "c"),                                # empty doc
    (7, None, "c"),                              # null text
]


def _docs(rows, n_blocks=1):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.large_string()),
            "source": pa.array([r[2] for r in rows], pa.large_string()),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks)


def test_hot_report(ray_session):
    hot = host_hot_lines(_docs(ROWS, 3), group_col="source", num=2, den=3, min_docs=2)
    d = hot.to_pydict()
    # a has 3 docs: MENU in 3 (3*3>=2*3), FOOTER in 2 (3*2>=2*3 -> 6>=6)
    assert d["group"] == ["a", "a"]
    assert d["line"] == ["FOOTER", "MENU"]
    assert d["n_docs"] == [2, 3]
    assert d["g_docs"] == [3, 3]


def test_trim(ray_session):
    out = (
        trim_host_lines(_docs(ROWS, 3), group_col="source", num=2, den=3, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
    )
    texts = dict(zip(out.doc_id, out.text))
    assert texts[1] == "welcome to site a"
    assert texts[3] == "third page\nother footer"
    assert texts[4] == "MENU\nunrelated site\nFOOTER"  # host b untouched
    assert texts[5] == "hello\n\nworld"                # empty line preserved
    assert texts[6] == ""
    assert texts[7] == ""                              # null -> empty


def test_partition_invariance(ray_session):
    a = host_hot_lines(_docs(ROWS, 1), group_col="source", num=2, den=3, min_docs=2)
    b = host_hot_lines(_docs(ROWS, 4), group_col="source", num=2, den=3, min_docs=2)
    assert a.to_pydict() == b.to_pydict()
    ta = (
        trim_host_lines(_docs(ROWS, 1), group_col="source", num=2, den=3, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    tb = (
        trim_host_lines(_docs(ROWS, 4), group_col="source", num=2, den=3, min_docs=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert ta.equals(tb)


def test_no_hot_lines(ray_session):
    rows = [(1, "unique one", "a"), (2, "unique two", "a")]
    hot = host_hot_lines(_docs(rows), group_col="source")
    assert hot.num_rows == 0
    assert hot.schema.names == ["group", "line", "n_docs", "g_docs"]
    out = trim_host_lines(_docs(rows), group_col="source").to_pandas()
    assert sorted(out.text) == ["unique one", "unique two"]
