"""Stitch detection: planted continuations, direction, cap, degenerate
docs, partition invariance."""

import pyarrow as pa

import ray.data as rd

from raydedup.stages.stitch import stitch_pairs


def _docs(rows, n_blocks=1):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.large_string()),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks)


ROWS = [
    (1, "part one of the story continues on next page"),
    (2, "on next page the hero returns home quickly"),     # head == tail(1)
    (3, "the hero returns but this is unrelated text"),    # no 3-gram link
    (4, "short"),                                          # < k tokens
    (5, ""),                                               # empty
    (6, "Continues ON Next PAGE the end"),                 # case-folded tail? head check
    (7, "héllo wörld straße on next page"),                # non-ASCII tail -> 2's head
]


def test_planted_pairs(ray_session):
    out = stitch_pairs(_docs(ROWS, 3), k=3)
    pairs = set(zip(out.column("a").to_pylist(), out.column("b").to_pylist()))
    assert (1, 2) in pairs                # tail "on next page" == head of 2
    assert (7, 2) in pairs                # non-ASCII doc's ASCII tail matches too
    assert all(a != b for a, b in pairs)
    # direction matters: head(1) != tail(2)
    assert (2, 1) not in pairs


def test_case_folding(ray_session):
    rows = [
        (1, "alpha beta GAMMA DELTA epsilon"),
        (2, "gamma delta EPSILON and more words"),
    ]
    out = stitch_pairs(_docs(rows), k=3)
    assert set(zip(out.column("a").to_pylist(), out.column("b").to_pylist())) == {(1, 2)}


def test_cap_drops_viral_runs(ray_session):
    # 80 docs all ending with the same 3 tokens + 80 starting with them:
    # run exceeds max_run=8 on both sides -> dropped, no pairs
    rows = [(i, f"unique{i} filler words then common tail here") for i in range(80)]
    rows += [(100 + i, f"common tail here unique{i} words follow") for i in range(80)]
    out = stitch_pairs(_docs(rows, 4), k=3, max_run=8)
    assert out.num_rows == 0
    # raising the cap admits the full cross product
    out2 = stitch_pairs(_docs(rows, 4), k=3, max_run=100)
    assert out2.num_rows == 80 * 80


def test_partition_invariance(ray_session):
    a = stitch_pairs(_docs(ROWS, 1), k=3)
    b = stitch_pairs(_docs(ROWS, 5), k=3)
    assert a.to_pydict() == b.to_pydict()


def test_empty(ray_session):
    out = stitch_pairs(_docs([(1, "a b"), (2, "")]), k=3)
    assert out.num_rows == 0
    assert out.schema.names == ["a", "b"]


def test_chains(ray_session):
    from raydedup.stages.stitch import stitch_chains

    rows = [
        # chain: 1 -> 2 -> 3 via unique 3-gram links
        (1, "start of one alpha beta gamma"),
        (2, "alpha beta gamma middle part delta epsilon zeta"),
        (3, "delta epsilon zeta the ending words"),
        # ambiguous: 4 and 5 both continue into 6's head -> dropped
        (4, "first variant common link here"),
        (5, "second variant common link here"),
        (6, "common link here continues onward now"),
        # pure 2-cycle: 7 <-> 8 (no head) -> no chain
        (7, "loop one cyc a b c loop two"),
        (8, "loop two cyc d e f loop one"),
    ]
    out = stitch_chains(_docs(rows, 3), k=3).to_pydict()
    assert out["chain_id"] == [1, 1, 1]
    assert out["pos"] == [0, 1, 2]
    assert out["doc_id"] == [1, 2, 3]


def test_chains_empty(ray_session):
    from raydedup.stages.stitch import stitch_chains

    out = stitch_chains(_docs([(1, "a b c d e")]), k=3)
    assert out.num_rows == 0
    assert out.schema.names == ["chain_id", "pos", "doc_id"]


def test_merge(ray_session):
    from raydedup.stages.stitch import stitch_merge

    rows = [
        (1, "start of one alpha beta gamma"),
        (2, "alpha beta gamma middle part delta epsilon zeta"),
        (3, "delta epsilon zeta the ending words"),
        (9, "unrelated standalone document text here"),
    ]
    out = stitch_merge(_docs(rows, 3), k=3).to_pydict()
    assert out["chain_id"] == [1]
    assert out["n_parts"] == [3]
    assert out["text"] == [
        "start of one alpha beta gamma middle part delta epsilon zeta "
        "the ending words"
    ]
