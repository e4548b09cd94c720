"""URL blocklist: first-match-wins attribution, filter/report agreement,
pattern order, degenerate urls."""

import pyarrow as pa

import ray.data as rd

from raydedup.stages.urlfilter import (
    DEFAULT_URL_BLOCKLIST,
    url_block_batch,
    url_filter,
    url_filter_report,
)


def _docs(urls, n_blocks=2):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(urls)), pa.int64()),
            "url": pa.array(urls, pa.large_string()),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks)


URLS = [
    "https://a.example/article/1",                      # clean
    "https://a.example/x?y=1&sessionid=deadbeef",       # pattern 0
    "https://b.example/tag/cats",                       # pattern 1
    "https://b.example/search?q=dogs",                  # pattern 2
    "https://c.example/calendar/2024/05",               # pattern 3
    "https://c.example/page/12345",                     # pattern 4
    "https://c.example/page/12",                        # \d{3,} needs 3+ digits
    "https://a.example/tag/x?sessionid=1",              # matches 0 AND 1 -> 0 wins
    None,                                               # null url: clean
]


def test_first_match_and_filter(ray_session):
    t = pa.table({"url": pa.array(URLS, pa.large_string())})
    out = url_block_batch(t, DEFAULT_URL_BLOCKLIST)
    assert out.column("blocked_by").to_pylist() == [-1, 0, 1, 2, 3, 4, -1, 0, -1]

    kept = url_filter(_docs(URLS)).to_pandas()
    assert sorted(kept.doc_id) == [0, 6, 8]

    rep = url_filter_report(_docs(URLS)).to_pydict()
    assert rep["pattern_idx"] == [0, 1, 2, 3, 4]
    assert rep["n_docs"] == [2, 1, 1, 1, 1]
    assert rep["pattern"][0] == "[?&]sessionid="
