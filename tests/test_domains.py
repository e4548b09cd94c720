"""Per-domain operators (stages/domains.py): host extraction passes,
combiner-first domain stats, deterministic per-domain cap."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from raydedup.hashing import mix64
from raydedup.stages.domains import (
    cap_per_domain,
    domain_stats,
    host_column,
    registered_domain_column,
)
from raydedup.stages.sampling import DEFAULT_SAMPLE_SEED


def test_host_extraction_passes():
    urls = pa.array(
        [
            "https://WWW.Foo-site.com:443/a/1?x=1#f",
            "http://u3@m.foo-site.com/a/2",
            "https://bar.com/x",
            "https://news.sub.bar.com:8080/y?q#z",
            "http://foo-site.com",
            "ftp+ssh://weird.scheme.org/file",
        ]
    )
    assert host_column(urls).to_pylist() == [
        "www.foo-site.com",
        "m.foo-site.com",
        "bar.com",
        "news.sub.bar.com",
        "foo-site.com",
        "weird.scheme.org",
    ]
    assert registered_domain_column(urls).to_pylist() == [
        "foo-site.com",
        "foo-site.com",
        "bar.com",
        "bar.com",
        "foo-site.com",
        "scheme.org",
    ]


def _url_tbl(n=400):
    subs = ["www.", "m.", "", "cdn."]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "url": pa.array(
                [f"https://{subs[i % 4]}s{i % 9}-x.com/p/{i}" for i in range(n)]
            ),
            "n_chars": pa.array((np.arange(n) * 7 % 311).astype(np.int64)),
        }
    )


def test_domain_stats_matches_pandas(ray_session):
    t = _url_tbl()
    got = (
        domain_stats(rd.from_arrow(t).repartition(7))
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    subs = ["www.", "m.", "", "cdn."]
    df["host"] = [f"{subs[i % 4]}s{i % 9}-x.com" for i in range(len(df))]
    want = (
        df.groupby("host")
        .agg(n_docs=("doc_id", "size"), total_chars=("n_chars", "sum"))
        .reset_index()
    )
    want["avg_chars"] = want.total_chars.astype(float) / want.n_docs
    want = want.sort_values("host").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


def test_domain_stats_empty(ray_session):
    ds = domain_stats(rd.from_arrow(_url_tbl(0)))
    # 0-row to_pandas drops columns in Ray 2.49; assert the DATASET schema
    assert ds.schema().names == ["host", "n_docs", "total_chars", "avg_chars"]
    assert len(ds.to_pandas()) == 0


def test_cap_per_domain_matches_window(ray_session):
    t = _url_tbl()
    got = (
        cap_per_domain(rd.from_arrow(t).repartition(5), k=3)
        .to_pandas()
        .sort_values(["domain", "rank"])
        .reset_index(drop=True)
    )
    df = t.to_pandas()
    df["domain"] = [f"s{i % 9}-x.com" for i in range(len(df))]
    rk = mix64(
        df.doc_id.to_numpy().astype(np.uint64) ^ np.uint64(DEFAULT_SAMPLE_SEED)
    ) >> np.uint64(1)
    df["_rk"] = rk.astype(np.int64)
    df = df.sort_values(["domain", "_rk", "doc_id"], ascending=[True, False, True])
    df["rank"] = df.groupby("domain").cumcount() + 1
    want = (
        df[df["rank"] <= 3][["domain", "_rk", "doc_id", "rank"]]
        .sort_values(["domain", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["domain", "_rk", "doc_id", "rank"]], want
    )
    # every domain capped at 3
    assert got.groupby("domain").size().max() <= 3


def test_cap_partition_invariance(ray_session):
    t = _url_tbl(300)
    a = (
        cap_per_domain(rd.from_arrow(t), k=2)
        .to_pandas()
        .sort_values(["domain", "rank"])
        .reset_index(drop=True)
    )
    b = (
        cap_per_domain(rd.from_arrow(t).repartition(13), k=2)
        .to_pandas()
        .sort_values(["domain", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
