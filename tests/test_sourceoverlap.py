"""Cross-source shingle-overlap matrix: naive set reference, partition
invariance, zero-overlap and tiny-doc edges."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from raydedup.stages.sourceoverlap import source_overlap


def _naive(rows, k=5):
    sets = {}
    for _, text, src in rows:
        words = (text or "").strip().lower().split()
        grams = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
        sets.setdefault(src, set()).update(grams)
    out = []
    srcs = sorted({s for *_, s in rows})
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            sa, sb = sets.get(a, set()), sets.get(b, set())
            common = len(sa & sb)
            union = len(sa | sb)
            out.append(
                (a, b, len(sa), len(sb), common, common / union if union else 0.0)
            )
    return out


def _docs(rows, n_blocks=1):
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.large_string()),
            "source": pa.array([r[2] for r in rows], pa.large_string()),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks)


ROWS = [
    (1, "alpha beta gamma delta epsilon zeta eta", "crawl_a"),
    (2, "alpha beta gamma delta epsilon theta iota", "crawl_a"),
    (3, "alpha beta gamma delta epsilon zeta kappa", "crawl_b"),  # overlaps a
    (4, "one two three four five six seven eight", "crawl_b"),
    (5, "nine ten eleven twelve thirteen fourteen", "feed_c"),     # no overlap
    (6, "short doc", "feed_c"),                                    # < k tokens
    (7, "", "feed_c"),                                             # empty
    (8, "héllo wörld foo bar baz qux quux deux", "feed_c"),        # non-ASCII
]


def test_matches_naive(ray_session):
    out = source_overlap(_docs(ROWS))
    got = list(
        zip(
            out.column("src_a").to_pylist(),
            out.column("src_b").to_pylist(),
            out.column("n_a").to_pylist(),
            out.column("n_b").to_pylist(),
            out.column("n_common").to_pylist(),
            out.column("jaccard").to_pylist(),
        )
    )
    exp = _naive(ROWS)
    assert [g[:5] for g in got] == [e[:5] for e in exp]
    assert np.allclose([g[5] for g in got], [e[5] for e in exp])
    # crawl_a/crawl_b genuinely overlap; feed_c overlaps nothing
    asym = {(a, b): c for a, b, _, _, c, _ in got}
    assert asym[("crawl_a", "crawl_b")] > 0
    assert asym[("crawl_a", "feed_c")] == 0


def test_partition_invariance(ray_session):
    a = source_overlap(_docs(ROWS * 3, 1))
    b = source_overlap(_docs(ROWS * 3, 5))
    assert a.to_pydict() == b.to_pydict()
    # duplicated docs add no distinct shingles
    assert a.to_pydict() == source_overlap(_docs(ROWS)).to_pydict()


def test_single_source(ray_session):
    out = source_overlap(_docs([(1, "a b c d e f g", "only")]))
    assert out.num_rows == 0
    assert out.schema.names == ["src_a", "src_b", "n_a", "n_b", "n_common", "jaccard"]


def test_source_clusters(ray_session):
    from raydedup.stages.sourceoverlap import source_clusters

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta", "m1"),
        (2, "alpha beta gamma delta epsilon zeta eta iota", "m2"),   # mirrors m1
        (3, "alpha beta gamma delta epsilon zeta eta kappa", "m3"),  # mirrors m2 and m1
        (4, "one two three four five six seven eight nine", "solo"),
    ]
    out = source_clusters(_docs(rows), tau_num=1, tau_den=3).to_pydict()
    rep = dict(zip(out["source"], out["cluster_rep"]))
    assert rep["m1"] == rep["m2"] == rep["m3"] == "m1"  # transitive merge, min rep
    assert rep["solo"] == "solo"
    # high threshold: nothing merges
    out2 = source_clusters(_docs(rows), tau_num=99, tau_den=100).to_pydict()
    assert all(s == r for s, r in zip(out2["source"], out2["cluster_rep"]))
