"""Within-doc line dedup tests: naive reference, degenerate docs,
non-ASCII, partition invariance, passthrough columns."""

from __future__ import annotations

import numpy as np
import pytest


def _naive(t: str | None):
    t = t or ""
    lines = t.split("\n")
    seen: set[str] = set()
    kept = []
    for line in lines:
        if line not in seen:
            seen.add(line)
            kept.append(line)
    return "\n".join(kept), len(lines), len(lines) - len(kept)


def _ds(texts, n_blocks: int = 1):
    import pyarrow as pa
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


@pytest.fixture(scope="module")
def texts():
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(40)]
    out = []
    for i in range(60):
        lines = [" ".join(rng.choice(vocab, size=6)) for _ in range(rng.integers(1, 8))]
        if i % 3 == 0:  # planted within-doc repeats
            lines = lines + lines[: max(1, len(lines) // 2)]
        out.append("\n".join(lines))
    out += ["", "x", None, "p\n\np\n\nq", "é\né\nü", "a\na\na\na"]
    return out


def test_matches_naive(ray_session, texts):
    from raydedup.stages.intradoc import para_dedup

    df = para_dedup(_ds(texts)).to_pandas().sort_values("doc_id")
    for i, t in enumerate(texts):
        want_text, want_n, want_dup = _naive(t)
        row = df[df.doc_id == i].iloc[0]
        assert row.text == want_text
        assert row.n_lines == want_n
        assert row.n_dup_lines == want_dup


def test_partition_invariance(ray_session, texts):
    from raydedup.stages.intradoc import para_dedup

    a = (
        para_dedup(_ds(texts, 1))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        para_dedup(_ds(texts, 7))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_passthrough_columns(ray_session):
    from raydedup.stages.intradoc import para_dedup

    df = para_dedup(_ds(["a\na\nb", "c"])).to_pandas()
    assert set(df.columns) == {"doc_id", "lang", "text", "n_lines", "n_dup_lines"}
    assert (df["lang"] == "en").all()


def test_empty_dataset(ray_session):
    from raydedup.stages.intradoc import para_dedup

    df = para_dedup(_ds([])).to_pandas()
    assert len(df) == 0
    # a 0-row KERNEL call must still return the typed output schema
    import pyarrow as pa

    from raydedup.stages.intradoc import dedup_lines_within

    out = dedup_lines_within(
        pa.table(
            {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.large_string())}
        )
    )
    assert out.num_rows == 0
    assert {"text", "n_lines", "n_dup_lines"} <= set(out.column_names)
