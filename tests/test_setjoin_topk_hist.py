"""Tests for the anti/semi key join, per-group top-k, and the grouped
value histogram: naive references, edge cases, partition invariance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _ds(tbl: pa.Table, n_blocks: int = 1):
    import ray.data as rd

    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


# --- anti / semi join -------------------------------------------------------

LEFT = pa.table(
    {
        "k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "x": pa.array(["a", "b", "c", "d", "e", "f"], pa.large_string()),
    }
)
RIGHT = pa.table({"r": pa.array([2, 2, 4, 9], pa.int64())})


def test_anti_join(ray_session):
    from raydedup.stages.setjoin import key_join_filter

    out = key_join_filter(_ds(LEFT), _ds(RIGHT), "k", "r", ["k", "x"], anti=True)
    got = sorted(out.to_pandas()["k"].tolist())
    assert got == [1, 3, 5, 6]


def test_semi_join(ray_session):
    from raydedup.stages.setjoin import key_join_filter

    out = key_join_filter(_ds(LEFT), _ds(RIGHT), "k", "r", ["k", "x"], anti=False)
    df = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert df["k"].tolist() == [2, 4]
    assert df["x"].tolist() == ["b", "d"]  # left columns pass through


def test_join_partition_invariance(ray_session):
    from raydedup.stages.setjoin import key_join_filter

    a = key_join_filter(_ds(LEFT), _ds(RIGHT), "k", "r", ["k", "x"], anti=True)
    b = key_join_filter(_ds(LEFT, 4), _ds(RIGHT, 3), "k", "r", ["k", "x"], anti=True)
    srt = lambda d: d.to_pandas().sort_values("k").reset_index(drop=True)
    assert srt(a).equals(srt(b))


def test_anti_join_empty_right(ray_session):
    from raydedup.stages.setjoin import key_join_filter

    empty = pa.table({"r": pa.array([], pa.int64())})
    out = key_join_filter(_ds(LEFT), _ds(empty), "k", "r", ["k", "x"], anti=True)
    assert sorted(out.to_pandas()["k"].tolist()) == [1, 2, 3, 4, 5, 6]


# --- per-group top-k --------------------------------------------------------

DOCS = pa.table(
    {
        "lang": pa.array(["en", "en", "en", "en", "de", "de", "fr"], pa.large_string()),
        "n": pa.array([10, 30, 30, 20, 5, 7, 9], pa.int64()),
        "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
    }
)


def _naive_topk(k):
    rows = list(zip(DOCS["lang"].to_pylist(), DOCS["n"].to_pylist(), DOCS["id"].to_pylist()))
    out = {}
    for lang in set(r[0] for r in rows):
        grp = sorted((r for r in rows if r[0] == lang), key=lambda r: (-r[1], r[2]))
        for rank, r in enumerate(grp[:k], 1):
            out[(lang, rank)] = (r[2], r[1])
    return out


def test_group_topk(ray_session):
    from raydedup.stages.grouptopk import group_topk

    got = group_topk(_ds(DOCS), "lang", "n", "id", k=2, columns=["lang", "n", "id"])
    df = got.to_pandas()
    want = _naive_topk(2)
    assert len(df) == len(want)
    for r in df.itertuples(index=False):
        assert want[(r.lang, r.rank)] == (r.id, r.n)
    # tie at n=30 inside en -> id ascending wins rank 1
    en = df[df.lang == "en"].sort_values("rank")
    assert en["id"].tolist() == [2, 3]


def test_group_topk_partition_invariance(ray_session):
    from raydedup.stages.grouptopk import group_topk

    srt = lambda d: (
        d.to_pandas().sort_values(["lang", "rank"]).reset_index(drop=True)
    )
    a = group_topk(_ds(DOCS), "lang", "n", "id", k=3)
    b = group_topk(_ds(DOCS, 5), "lang", "n", "id", k=3)
    assert srt(a).equals(srt(b))


def test_group_topk_k_larger_than_group(ray_session):
    from raydedup.stages.grouptopk import group_topk

    got = group_topk(_ds(DOCS), "lang", "n", "id", k=100).to_pandas()
    assert len(got) == 7  # every row kept, ranked


# --- grouped histogram ------------------------------------------------------


def test_value_histogram(ray_session):
    from raydedup.stages.histogram import value_histogram

    ev = pa.table(
        {
            "event_type": pa.array(
                ["a", "a", "a", "b", "b", "b"], pa.large_string()
            ),
            "value": pa.array([0.01, 4.99, 5.00, 12.34, -0.01, -5.00], pa.float64()),
        }
    )
    got = value_histogram(_ds(ev, 3), width_cents=500).to_pandas()
    rows = {(r.event_type, r.bin): (r.lo_cents, r.n) for r in got.itertuples(index=False)}
    # a: 1c and 499c -> bin 0; 500c -> bin 1
    assert rows[("a", 0)] == (0, 2) and rows[("a", 1)] == (500, 1)
    # b: 1234c -> bin 2; -1c -> bin -1 (floor, not truncate); -500c -> bin -1
    assert rows[("b", 2)] == (1000, 1)
    assert rows[("b", -1)] == (-500, 2)
    assert got["n"].sum() == 6


def test_histogram_partition_invariance(ray_session):
    import pyarrow.parquet as pq
    from raydedup.stages.histogram import value_histogram

    ev = pq.read_table("/root/testdata/sf0.001/events.parquet")
    a = value_histogram(_ds(ev), width_cents=500)
    b = value_histogram(_ds(ev, 7), width_cents=500)
    assert a.equals(b)


def test_anti_join_empty_left_keeps_schema(ray_session):
    # ADVICE r2: a fully-empty left side must keep the FULL projected
    # schema (k AND x), not collapse to the key column only
    from raydedup.stages.setjoin import key_join_filter

    empty = pa.table(
        {"k": pa.array([], pa.int64()), "x": pa.array([], pa.large_string())}
    )
    out = key_join_filter(_ds(empty), _ds(RIGHT), "k", "r", ["k", "x"], anti=True)
    # (ds.to_pandas() on a 0-row dataset drops columns — check the
    # block schema, which is what downstream hash comparison sees)
    assert out.schema().names == ["k", "x"]
    assert out.count() == 0
