"""Temperature (source-balanced) sampling: exact threshold reference,
sqrt-scaling behavior, partition invariance, validation."""

import math

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raydedup.hashing import mix64
from raydedup.stages.sampling import DEFAULT_SAMPLE_SEED, temperature_sample

U64 = np.uint64


def _docs(sizes: dict[str, int], n_blocks=1):
    ids, srcs = [], []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            ids.append(i)
            srcs.append(s)
            i += 1
    t = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "source": pa.array(srcs, pa.large_string()),
        }
    )
    return rd.from_arrow(t).repartition(n_blocks)


def _naive(sizes, scale_num, scale_den, seed=DEFAULT_SAMPLE_SEED):
    kept = []
    i = 0
    for s, n in sizes.items():
        thr = min((scale_num * math.isqrt(n) * 2**64) // (scale_den * n), 2**64 - 1)
        for _ in range(n):
            r = int(mix64(np.array([i], dtype=np.int64).view(U64) ^ U64(seed))[0])
            if r < thr:
                kept.append((i, s))
            i += 1
    return kept


SIZES = {"big": 400, "mid": 100, "small": 16, "one": 1}


def test_matches_exact_reference(ray_session):
    out = (
        temperature_sample(_docs(SIZES), scale_num=2, scale_den=1)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(zip(out.doc_id, out.source)) == _naive(SIZES, 2, 1)


def test_sqrt_scaling(ray_session):
    # expected kept ~ scale * isqrt(n): big 2*20=40, mid 2*10=20,
    # small 2*4=8, one kept with p=1 (threshold saturates)
    out = temperature_sample(_docs(SIZES), scale_num=2, scale_den=1).to_pandas()
    by = out.groupby("source").size()
    assert by.get("one", 0) == 1                       # p >= 1 keeps all
    assert 20 <= by["big"] <= 60                        # ~40, hash variance
    assert by["big"] < 400 * 0.25                       # far below proportional
    assert by["mid"] >= by["small"]


def test_partition_invariance(ray_session):
    a = temperature_sample(_docs(SIZES, 1), scale_num=1, scale_den=2).to_pandas()
    b = temperature_sample(_docs(SIZES, 7), scale_num=1, scale_den=2).to_pandas()
    assert sorted(zip(a.doc_id, a.source)) == sorted(zip(b.doc_id, b.source))


def test_validation(ray_session):
    with pytest.raises(ValueError):
        temperature_sample(_docs({"a": 2}), scale_num=0)
