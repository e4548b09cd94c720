"""Curation funnel (pipelines/curate.py): quality -> contamination ->
dedup -> sample, with fixed status precedence."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from raydedup.config import DedupConfig
from raydedup.hashing import U64, mix64
from raydedup.pipelines.curate import CurateParams, curate
from raydedup.stages.extract import sha256_bytes_column
from raydedup.stages.sampling import DEFAULT_SAMPLE_SEED


def _mkdocs(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": texts,
                "text_sha256": sha256_bytes_column(texts),
            }
        )
    )


def _clean(rng, n_tokens=60):
    # alphabetic tokens only: digit-bearing tokens would trip the
    # digit-ratio quality filter
    words = [
        "tok" + "".join(chr(97 + int(c)) for c in str(i)) for i in range(400)
    ]
    return " ".join(words[j] for j in rng.integers(0, 400, size=n_tokens))


def test_funnel_statuses_and_precedence(ray_session):
    rng = np.random.default_rng(21)
    eval_text = _clean(rng, 80)
    texts = {
        0: _clean(rng),                      # kept
        1: "too short",                      # quality (n_tokens < 20)
        2: " ".join(["12345"] * 30),         # quality (digit ratio)
        3: _clean(rng),                      # kept; 4 is its copy
        5: " ".join(
            _clean(rng, 25).split()[:15] + eval_text.split()[10:30]
        ),                                   # contaminated (20-token splice)
        6: "x " * 10,                        # quality (short)
    }
    texts[4] = texts[3]                      # exact dup of 3 -> exact_dup
    # 7 is an exact copy of the CONTAMINATED doc: 5 never reaches the
    # dedup stage, so 7 is the only group member there.
    texts[7] = texts[5]
    docs = _mkdocs([texts[i] for i in range(8)])
    ev = _mkdocs([eval_text], ids=[100])
    res = curate(docs, eval_docs=ev, params=CurateParams())
    st = dict(
        zip(
            res.statuses.to_pandas().doc_id,
            res.statuses.to_pandas().status,
        )
    )
    assert st[0] == "kept"
    assert st[1] == "quality" and st[2] == "quality" and st[6] == "quality"
    assert st[3] == "kept" and st[4] == "exact_dup"
    assert st[5] == "contaminated" and st[7] == "contaminated"
    assert res.metrics == {"kept": 2, "quality": 3, "exact_dup": 1, "contaminated": 2}


def test_contaminated_dup_partner_survives(ray_session):
    """If the min-id copy is removed as contaminated, the clean copy is
    the lone digest-group member and stays kept."""
    rng = np.random.default_rng(22)
    eval_text = _clean(rng, 60)
    dirty = " ".join(_clean(rng, 20).split() + eval_text.split()[:25])
    clean_copy = _clean(rng)
    docs = _mkdocs([dirty, clean_copy, clean_copy])  # ids 0,1,2
    ev = _mkdocs([eval_text], ids=[50])
    res = curate(docs, eval_docs=ev)
    st = dict(zip(res.statuses.to_pandas().doc_id, res.statuses.to_pandas().status))
    assert st[0] == "contaminated"
    assert st[1] == "kept" and st[2] == "exact_dup"


def test_sampling_stage_scalar_rule(ray_session):
    rng = np.random.default_rng(23)
    texts = [_clean(rng) for _ in range(300)]
    rate = 0.5
    res = curate(_mkdocs(texts), params=CurateParams(sample_rate=rate))
    df = res.statuses.to_pandas()
    thr = np.uint64(int(rate * 2.0**64))
    ranks = mix64(df.doc_id.to_numpy().astype(np.int64).view(U64) ^ U64(DEFAULT_SAMPLE_SEED))
    want = np.where(ranks < thr, "kept", "sampled_out")
    got = df.sort_values("doc_id").status.to_numpy()
    want = want[np.argsort(df.doc_id.to_numpy())]
    assert (got == want).all()


def test_near_dedup_mode(ray_session):
    rng = np.random.default_rng(24)
    base = _clean(rng, 100)
    toks = base.split()
    near = " ".join(toks[:-1] + ["changed"])  # one-token edit: near dup
    other = _clean(rng, 90)
    docs = _mkdocs([base, near, other, "tiny"])
    res = curate(docs, params=CurateParams(near_dedup=True))
    st = dict(zip(res.statuses.to_pandas().doc_id, res.statuses.to_pandas().status))
    assert st[3] == "quality"
    assert st[2] == "kept"
    assert sorted([st[0], st[1]]) == ["kept", "near_dup"]
    assert res.metrics["near_dup"] == 1


def test_partition_invariance(ray_session):
    rng = np.random.default_rng(25)
    texts = [_clean(rng) for _ in range(150)]
    texts[10] = texts[3]
    texts[77] = texts[3]
    a = curate(_mkdocs(texts)).statuses.to_pandas().sort_values("doc_id")
    ds = _mkdocs(texts).repartition(17)
    b = curate(ds).statuses.to_pandas().sort_values("doc_id")
    assert a.status.tolist() == b.status.tolist()
    assert (a.status == "exact_dup").sum() == 2


def test_negative_sample_rate_rejected():
    import pytest

    with pytest.raises(ValueError):
        CurateParams(sample_rate=-0.2)
    with pytest.raises(ValueError):
        CurateParams(sample_rate=1.5)
