"""keep_latest (snapshot dedup) and the standalone connected_components
operator vs pure-Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.stages.cluster_scale import connected_components
from raydedup.stages.snapshot import keep_latest


def _ref_keep_latest(df: pd.DataFrame, key, order, tie) -> pd.DataFrame:
    df = df.sort_values([key, order, tie], ascending=[True, False, True])
    return df.groupby(key, as_index=False).head(1)


@pytest.fixture()
def pages_df():
    rng = np.random.default_rng(404)
    n = 5000
    return pd.DataFrame(
        {
            "url": [f"d{int(i)}.example/p{int(i) % 7}" for i in rng.integers(0, 400, n)],
            "warc_ts": pd.to_datetime(rng.integers(0, 10_000, n), unit="h"),
            "doc_id": rng.integers(0, 10**9, n).astype("int64"),
        }
    )


def test_keep_latest_matches_reference(ray_session, pages_df):
    out = (
        keep_latest(
            rd.from_pandas(pages_df), "url", "warc_ts", "doc_id",
            columns=["url", "doc_id", "warc_ts"],
        )
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    ref = (
        _ref_keep_latest(pages_df, "url", "warc_ts", "doc_id")[
            ["url", "doc_id", "warc_ts"]
        ]
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref)


def test_keep_latest_partition_invariant_and_ties(ray_session, pages_df):
    # force exact order ties: duplicate every row with a bumped doc_id —
    # the winner per (url, ts) must be the SMALLER doc_id
    dup = pages_df.copy()
    dup["doc_id"] = dup["doc_id"] + 1
    both = pd.concat([dup, pages_df], ignore_index=True)
    a = (
        keep_latest(rd.from_pandas(both), "url", "warc_ts", "doc_id")
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    b = (
        keep_latest(rd.from_pandas(both).repartition(13), "url", "warc_ts", "doc_id")
        .to_pandas().sort_values("url").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    ref = _ref_keep_latest(both, "url", "warc_ts", "doc_id")
    assert set(zip(a.url, a.doc_id)) == set(zip(ref.url, ref.doc_id))


def test_keep_latest_int_key_and_float_order(ray_session):
    df = pd.DataFrame(
        {
            "k": [1, 1, 2, 2, 3],
            "v": [0.5, 0.9, -1.0, -1.0, 2.0],
            "t": [9, 7, 4, 3, 1],
        }
    )
    out = keep_latest(rd.from_pandas(df), "k", "v", "t").to_pandas()
    got = dict(zip(out.k, out.t))
    assert got == {1: 7, 2: 3, 3: 1}


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def test_connected_components_matches_reference(ray_session):
    rng = np.random.default_rng(77)
    a = rng.integers(0, 2000, 4000).astype("int64")
    b = rng.integers(0, 2000, 4000).astype("int64")
    edges = pa.table({"a": pa.array(a), "b": pa.array(b)})
    out = connected_components(rd.from_arrow(edges), n_shards=3, num_buckets=8).to_pandas()

    uf = _UF()
    for x, y in zip(a, b):
        uf.union(int(x), int(y))
    nodes = sorted(set(a.tolist()) | set(b.tolist()))
    # min-label convention: component id = min node id in the component
    root_min: dict[int, int] = {}
    for n in nodes:
        r = uf.find(n)
        root_min[r] = min(root_min.get(r, n), n)
    ref = {n: root_min[uf.find(n)] for n in nodes}

    assert len(out) == len(nodes)
    got = dict(zip(out.node, out.component))
    assert got == ref


def test_connected_components_chain_collapses(ray_session):
    # one long chain exercises multi-round contraction + pointer jumping
    n = 5000
    edges = pa.table(
        {
            "a": pa.array(np.arange(n - 1, dtype="int64")),
            "b": pa.array(np.arange(1, n, dtype="int64")),
        }
    )
    out = connected_components(rd.from_arrow(edges), n_shards=4, num_buckets=8).to_pandas()
    assert len(out) == n
    assert (out.component == 0).all()


def test_kmv_distinct_accuracy_and_invariance(ray_session):
    from raydedup.stages.sketch import kmv_distinct

    rng = np.random.default_rng(99)
    n = 40_000
    groups = np.array(["g0", "g1", "g2", "g3"])[rng.integers(0, 4, n)]
    # true distinct per group: ~3000, 300, 40 (exact path), huge skew
    vals = np.where(
        groups == "g0",
        rng.integers(0, 3000, n),
        np.where(groups == "g1", rng.integers(0, 300, n), rng.integers(0, 40, n)),
    ).astype("int64")
    df = pd.DataFrame({"g": groups, "v": vals})
    out = kmv_distinct(rd.from_pandas(df), "g", "v", k=64).to_pandas()
    true = df.groupby("g")["v"].nunique()
    got = dict(zip(out.g, out.est_distinct))
    for g, t in true.items():
        if t < 64:
            assert got[g] == t  # exact below k
        else:
            assert abs(got[g] - t) / t < 0.5  # 1/sqrt(64) noise, loose gate
    # partition invariance: values identical under any input blocking
    out2 = kmv_distinct(rd.from_pandas(df).repartition(17), "g", "v", k=64).to_pandas()
    key = lambda d: d.sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(out), key(out2))


def test_kmv_distinct_string_values_and_small_k(ray_session):
    from raydedup.stages.sketch import kmv_distinct

    df = pd.DataFrame(
        {"g": ["a"] * 6 + ["b"] * 2, "v": ["x", "y", "z", "x", "y", "w", "p", "p"]}
    )
    out = kmv_distinct(rd.from_pandas(df), "g", "v", k=8).to_pandas()
    got = dict(zip(out.g, out.est_distinct))
    assert got == {"a": 4.0, "b": 1.0}
    assert dict(zip(out.g, out.n_tracked)) == {"a": 4, "b": 1}
    with pytest.raises(ValueError):
        kmv_distinct(rd.from_pandas(df), "g", "v", k=1)


def test_url_canonicalization_pinned():
    from raydedup.stages.urlnorm import canonical_url_column

    cases = {
        "http://a.com/x?utm_source=tw&b=2#frag": "http://a.com/x?b=2",
        "https://b.com:443/p//q///r?utm_a=1": "https://b.com/p/q/r",
        "http://c.com:80/": "http://c.com/",
        "http://d.com/x?b=1&utm_x=2&c=3": "http://d.com/x?b=1&c=3",
        "http://e.com/x?utm_a=1&utm_b=2": "http://e.com/x",
        "http://f.com/x?fbclid=abc": "http://f.com/x",
        "http://g.com/x?a=1&gclid=z&b=2&": "http://g.com/x?a=1&b=2",
        "http://h.com:8080/x?a=1": "http://h.com:8080/x?a=1",
        "http://i.com/plain": "http://i.com/plain",
        "http://j.com/x#only-frag": "http://j.com/x",
        "http://k.com//double//slash": "http://k.com/double/slash",
        "": "",
    }
    got = canonical_url_column(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())
    # idempotent: canonical(canonical(u)) == canonical(u)
    assert canonical_url_column(pa.array(got)).to_pylist() == got


def test_url_canonicalization_duckdb_parity():
    import duckdb

    from raydedup.stages.urlnorm import (
        URL_PASSES_POST,
        URL_PASSES_PRE,
        canonical_url_column,
    )

    rng = np.random.default_rng(31)
    parts = ["?utm_source=a", "?q=1", "&utm_medium=b", "&r=2", "#f", ":80", "//"]
    urls = [
        "http://s%d.com%s/p%s%s"
        % (i, ":80" if i % 4 == 0 else "", "/x" * int(rng.integers(0, 3)),
           "".join(rng.choice(parts, size=int(rng.integers(0, 4)))))
        for i in range(300)
    ]
    got = canonical_url_column(pa.array(urls)).to_pylist()
    pre = "url"
    for pat, rep in URL_PASSES_PRE:
        pre = f"regexp_replace({pre}, '{pat}', '{rep}', 'g')"
    post = "u2"
    for pat, rep in URL_PASSES_POST:
        post = f"regexp_replace({post}, '{pat}', '{rep}', 'g')"
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    ora = [
        r[0]
        for r in con.execute(
            f"""WITH s1 AS (SELECT url, {pre} AS u1 FROM t),
            s2 AS (SELECT url, CASE WHEN contains(u1,'?') THEN u1
                   ELSE regexp_replace(u1,'&','?') END AS u2 FROM s1)
            SELECT {post} FROM s2"""
        ).fetchall()
    ]
    assert got == ora
