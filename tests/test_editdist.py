"""Edit-distance verification tests: DP kernel vs naive quadratic DP
and vs DuckDB's byte-based levenshtein, fuzzy_pairs e2e on planted
near-identical docs, and partition invariance."""

from __future__ import annotations

import numpy as np
import pytest

from raydedup.stages.editdist import levenshtein_bytes


def _naive_lev(a: bytes, b: bytes) -> int:
    n, m = len(a), len(b)
    dp = list(range(m + 1))
    for i in range(1, n + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, m + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[m]


def _arr(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-8"), dtype=np.uint8)


def test_kernel_pinned():
    assert levenshtein_bytes(_arr("kitten"), _arr("sitting")) == 3
    assert levenshtein_bytes(_arr(""), _arr("abc")) == 3
    assert levenshtein_bytes(_arr("abc"), _arr("")) == 3
    assert levenshtein_bytes(_arr(""), _arr("")) == 0
    assert levenshtein_bytes(_arr("same"), _arr("same")) == 0
    # byte-based (matches DuckDB): naïve -> naive is 2, not 1
    assert levenshtein_bytes(_arr("naïve"), _arr("naive")) == 2
    assert levenshtein_bytes(_arr("日本語"), _arr("日本")) == 3


def test_kernel_matches_naive_random():
    rng = np.random.default_rng(5)
    for _ in range(60):
        n, m = int(rng.integers(0, 30)), int(rng.integers(0, 30))
        a = bytes(rng.integers(97, 103, size=n, dtype=np.uint8))
        b = bytes(rng.integers(97, 103, size=m, dtype=np.uint8))
        assert levenshtein_bytes(
            np.frombuffer(a, np.uint8), np.frombuffer(b, np.uint8)
        ) == _naive_lev(a, b)


def test_kernel_matches_duckdb():
    import duckdb

    rng = np.random.default_rng(9)
    cases = []
    for _ in range(25):
        n, m = int(rng.integers(0, 40)), int(rng.integers(0, 40))
        cases.append(
            (
                "".join(chr(c) for c in rng.integers(97, 105, size=n)),
                "".join(chr(c) for c in rng.integers(97, 105, size=m)),
            )
        )
    cases += [("naïve", "naive"), ("équipe", "equipe"), ("日本語です", "日本語だ")]
    for a, b in cases:
        want = duckdb.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()[0]
        assert levenshtein_bytes(_arr(a), _arr(b)) == want, (a, b)


def _pairs_ds(pairs):
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "a": pa.array([p[0] for p in pairs], pa.int64()),
                "b": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


def _docs_ds(texts: dict[int, str], n_blocks: int = 1):
    import pyarrow as pa
    import ray.data as rd

    tbl = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.large_string()),
        }
    )
    ds = rd.from_arrow(tbl)
    return ds.repartition(n_blocks) if n_blocks > 1 else ds


def test_fuzzy_pairs_e2e(ray_session):
    from raydedup.stages.editdist import fuzzy_pairs

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumped over the lazy dog",  # 2 edits
        3: "completely different content here entirely",
        4: "",
    }
    pairs = [(1, 2), (1, 3), (1, 4)]
    got = (
        fuzzy_pairs(_pairs_ds(pairs), _docs_ds(texts), np.array([1, 2, 3, 4]))
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert list(got.a) == [1, 1, 1] and list(got.b) == [2, 3, 4]
    d12 = _naive_lev(texts[1].encode(), texts[2].encode())
    assert got.dist[0] == d12
    assert got.sim[0] == 1.0 - d12 / len(texts[2])
    assert got.dist[2] == len(texts[1]) and got.sim[2] == 0.0
    # min_sim filter keeps only the near-identical pair
    kept = fuzzy_pairs(
        _pairs_ds(pairs), _docs_ds(texts), np.array([1, 2, 3, 4]), min_sim=0.9
    ).to_pandas()
    assert list(kept.a) == [1] and list(kept.b) == [2]


def test_fuzzy_pairs_partition_invariance(ray_session):
    from raydedup.stages.editdist import fuzzy_pairs

    rng = np.random.default_rng(13)
    texts = {
        i: " ".join(f"w{x}" for x in rng.integers(0, 40, size=20)) for i in range(30)
    }
    pairs = [(i, j) for i in range(0, 10) for j in range(i + 1, 10)]
    ids = np.arange(30, dtype=np.int64)
    a = (
        fuzzy_pairs(_pairs_ds(pairs), _docs_ds(texts, 1), ids)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    b = (
        fuzzy_pairs(_pairs_ds(pairs), _docs_ds(texts, 6), ids)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    assert a.equals(b)
